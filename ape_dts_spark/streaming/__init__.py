from ape_dts_spark.streaming.driver import CdcEngine, EngineConfig

__all__ = ["CdcEngine", "EngineConfig"]
