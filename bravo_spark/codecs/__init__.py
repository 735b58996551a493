from bravo_spark.codecs import flink, hashes  # noqa: F401
