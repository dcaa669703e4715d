from pgs_spark.functions.extract import extract_refs, with_refs  # noqa: F401
