from imposm3_spark.pipeline.engine import ImportPipeline  # noqa: F401
