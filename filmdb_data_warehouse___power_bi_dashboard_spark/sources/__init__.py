from .catalog import load_source_tables, read_table, register_views  # noqa: F401
from .sinks import merge_upsert, stage_and_swap_write  # noqa: F401
