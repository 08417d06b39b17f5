from data_lakehouse_platform_spark.functions.money import dec, dec_sum, dec_avg
from data_lakehouse_platform_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["dec", "dec_sum", "dec_avg", "cosine_similarity", "dot", "l2_norm"]
