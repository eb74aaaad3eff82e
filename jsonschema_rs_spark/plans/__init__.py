from jsonschema_rs_spark.plans.plan import CompiledSchema

__all__ = ["CompiledSchema"]
