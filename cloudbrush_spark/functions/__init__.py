from cloudbrush_spark.functions import dna, hashing, text  # noqa: F401
