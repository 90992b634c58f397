from gmall_flink_210726_spark.functions import scalar
from gmall_flink_210726_spark.functions.tokenizer import tokenize_udf

__all__ = ["scalar", "tokenize_udf"]
