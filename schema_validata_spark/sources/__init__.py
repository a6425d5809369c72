from .readers import read_table, read_csv_validated, detect_file_encoding
from .tableio import TableIO

__all__ = ["read_table", "read_csv_validated", "detect_file_encoding",
           "TableIO"]
