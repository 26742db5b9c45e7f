from .pages import PAGES_SCHEMA, generate_pages, pages_dataframe

__all__ = ["PAGES_SCHEMA", "generate_pages", "pages_dataframe"]
