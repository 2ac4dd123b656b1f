from qalsh_spark.plans.pipeline import DedupPipeline, run_dedup

__all__ = ["DedupPipeline", "run_dedup"]
