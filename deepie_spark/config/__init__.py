from deepie_spark.config.schema import SYNTH_SCHEMA, Predicate, SpoSchema

__all__ = ["SYNTH_SCHEMA", "Predicate", "SpoSchema"]
