"""Source/sink surface (SURVEY.md §2.2 "Scans/sources" and
"Sinks"): the reference reads one hardcoded text file
(maprdeuce.cpp:41,134-179) and writes one text result file
(maprdeuce.cpp:322-329) with manual overwrite (428-455).  Here:
parquet/csv/json/text readers with explicit schemas, and writers
with SaveMode + partitioning.
"""
