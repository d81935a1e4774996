"""Input-format sources beyond parquet: WARC archives (the native
format of web-crawl corpora such as Common Crawl)."""
