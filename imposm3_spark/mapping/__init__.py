from imposm3_spark.mapping.config import Mapping, Table, Column, load_mapping  # noqa: F401
