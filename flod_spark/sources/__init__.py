from flod_spark.sources.pygen import (
    FlodDumpDataSource,
    FlodGenDataSource,
    register_flodgen,
)

__all__ = ["FlodDumpDataSource", "FlodGenDataSource", "register_flodgen"]
