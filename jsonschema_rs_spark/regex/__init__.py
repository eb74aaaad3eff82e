from jsonschema_rs_spark.regex.ecma import ecma_to_java, literal_prefix

__all__ = ["ecma_to_java", "literal_prefix"]
