"""Physical-plan inspection helpers — the scale-discipline
enforcement layer (SURVEY.md §4): tests assert broadcast joins stay
broadcast, filters reach the parquet scan, and shuffle counts don't
regress.
"""
