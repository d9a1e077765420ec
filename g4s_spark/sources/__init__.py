from .tables import DEFAULT_SF_DIR, TABLES, load_table, load_tables, register_views

__all__ = ["DEFAULT_SF_DIR", "TABLES", "load_table", "load_tables", "register_views"]
