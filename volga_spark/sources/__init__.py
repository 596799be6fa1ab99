from volga_spark.sources.datagen import DatagenSpec, FieldSpec, generate

__all__ = ["DatagenSpec", "FieldSpec", "generate"]
