from ape_dts_spark.pipelines.corpus import CorpusPipelineReport, corpus_pipeline

__all__ = ["corpus_pipeline", "CorpusPipelineReport"]
