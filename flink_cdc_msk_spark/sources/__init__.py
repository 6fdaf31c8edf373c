from .cdc_sim import synthesize_mysql_events
from .tables import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views", "synthesize_mysql_events"]
