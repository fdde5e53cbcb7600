from wiser_spark.oracle.engine import OracleEngine

__all__ = ["OracleEngine"]
