from ocr_spark.sources.io import load_table, load_tables, read_pages, write_extracted

__all__ = ["load_table", "load_tables", "read_pages", "write_extracted"]
