from ape_dts_spark.sources.generator import gen_changes, gen_ddl_events, gen_pages_seed

__all__ = ["gen_pages_seed", "gen_changes", "gen_ddl_events"]
