"""Sources: loaders that turn external data into the node table.

- :mod:`architxt_spark.sources.relational` — relational databases / parquet
  tables with FK metadata (``architxt/database/loader/sql.py``)
- :mod:`architxt_spark.sources.documents` — nested documents
  (JSON/XML/CSV/YAML/TOML) (``architxt/database/loader/documents.py``)
- :mod:`architxt_spark.trees` — JSONL forest IO (``architxt/forest.py``)
- :mod:`architxt_spark.sources.warc` — WARC/CommonCrawl web archives
  (beyond-reference: the 100-TB pretraining input format)
"""

from architxt_spark.sources.relational import FK, read_relational  # noqa: F401
from architxt_spark.sources.documents import (  # noqa: F401
    read_document_value,
    read_documents_df,
)
from architxt_spark.sources.warc import (  # noqa: F401
    build_warc,
    html_to_text,
    parse_warc,
    read_warc,
    read_warc_split,
)
