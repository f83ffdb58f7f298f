from .graph_sink import FlightGraphSink, GraphSink, ParquetGraphSink

__all__ = ["FlightGraphSink", "GraphSink", "ParquetGraphSink"]
