from aave_etl_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
