from jsonschema_rs_spark.spec.model import meta_validate

__all__ = ["meta_validate"]
