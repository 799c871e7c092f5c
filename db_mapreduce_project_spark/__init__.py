"""PySpark-native analytics engine with the query/data-processing
capabilities of byoungukpark/DB_MapReduce_project (reference:
/root/reference/maprdeuce.cpp), generalized to a DataFrame-first
engine per SURVEY.md.

The reference is a single-machine disk-backed MapReduce word-count
engine (split -> map -> sort -> [combine] -> merge -> reduce,
maprdeuce.cpp:623-748).  Here every stage is expressed declaratively
on the PySpark DataFrame API and Catalyst/Tungsten supply the
physical execution (partial aggregation, external sort, task
scheduling) that the reference hand-rolled.
"""

__version__ = "0.1.0"
