from hbase_1_3_0_spark.functions import codecs

__all__ = ["codecs"]
