"""Sources & sinks: schema'd readers, writers, and the testdata loader."""

from .readers import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_parquet,
    read_tsv,
)
from .writers import write_parquet  # noqa: F401
