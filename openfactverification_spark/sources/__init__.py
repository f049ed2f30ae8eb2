from .transcripts import (  # noqa: F401
    SENTS,
    TOOLS,
    transcripts_df,
    transcripts_duckdb_sql,
)
from .tables import load_tables, table_path  # noqa: F401
