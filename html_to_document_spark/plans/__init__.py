"""Job assembly: SparkSession tuning + the spark-submit entrypoint."""
