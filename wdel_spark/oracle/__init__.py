from wdel_spark.oracle.pandas_oracle import run_oracle, pairwise_f1

__all__ = ["run_oracle", "pairwise_f1"]
