from bran_spark.fixtures.gen import generate, scale_rows  # noqa: F401
