from qalsh_spark.sources.catalog import StageCatalog, read_documents, adapt_documents

__all__ = ["StageCatalog", "read_documents", "adapt_documents"]
