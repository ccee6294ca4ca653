from wdel_spark.operators.cc import connected_components
from wdel_spark.operators.topk import top_k_per_group
from wdel_spark.operators.skew import salted_join, hot_keys

__all__ = ["connected_components", "top_k_per_group", "salted_join", "hot_keys"]
