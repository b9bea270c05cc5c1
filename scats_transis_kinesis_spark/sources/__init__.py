from .loaders import load_table, load_tables, register_views, stream_events

__all__ = ["load_table", "load_tables", "register_views", "stream_events"]
