from etl_8x8_spark.sources.readers import load_table, scratch_dir
from etl_8x8_spark.sources.schemas import TABLE_SCHEMAS

__all__ = ["load_table", "scratch_dir", "TABLE_SCHEMAS"]
