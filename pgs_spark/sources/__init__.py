from pgs_spark.sources.generator import generate_code_files  # noqa: F401
from pgs_spark.sources.tables import load_table, register_views  # noqa: F401
