from flod_spark.sources.pygen import FlodGenDataSource, register_flodgen

__all__ = ["FlodGenDataSource", "register_flodgen"]
