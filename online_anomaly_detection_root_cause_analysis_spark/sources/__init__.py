from .pages import generate_pages, pages_schema, read_pages, read_pages_stream, write_pages

__all__ = [
    "generate_pages",
    "pages_schema",
    "read_pages",
    "read_pages_stream",
    "write_pages",
]
