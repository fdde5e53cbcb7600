from wiser_spark.serving.server import SearchServer, serve_index

__all__ = ["SearchServer", "serve_index"]
