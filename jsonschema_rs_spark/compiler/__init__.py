from jsonschema_rs_spark.compiler.compiler import compile_schema

__all__ = ["compile_schema"]
