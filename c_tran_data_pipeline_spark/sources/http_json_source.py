"""Custom PySpark DataSource for HTTP JSON acquisition (S1).

The reference's producer (``producer.py:76-78``) does a single
``requests.get(url)`` → ``json.loads`` → per-element records on the
driver. ``fetch_json_to_df`` (sources/readers.py) mirrors that thin
driver-side shape; THIS module is the scale form: a PySpark-4 Python
DataSource (``spark.read.format("http_json")``) whose planner emits one
input partition PER URL, so a paginated/sharded endpoint list fans out
across executors — acquisition itself becomes distributed, retryable
per-task, and composable with every downstream operator.

Each fetched document is emitted as one raw-JSON ``value`` row per
top-level array element (objects emit a single row). Parsing stays
downstream via ``from_json`` + the quarantine split
(``read_json_records``), identical to the file-based JSON path — the
source ships bytes, the executors do schema projection.

Transport is stdlib ``urllib`` (public knowledge only); ``file://``
URLs work out of the box, which is how tests exercise the full
plan without a network.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class HttpJsonDataSource(DataSource):
    """``spark.read.format("http_json").option("urls", "u1,u2").load()``

    Options:
      urls — comma- or newline-separated endpoint list (required;
             ``url`` accepted as an alias for a single endpoint)

    Schema is fixed at ``value string`` (raw JSON per record): schema
    belongs to the parse stage, where PERMISSIVE mode + quarantine can
    route malformed records instead of failing the scan.
    """

    @classmethod
    def name(cls) -> str:
        return "http_json"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> "HttpJsonReader":
        raw = self.options.get("urls") or self.options.get("url") or ""
        urls = [u.strip() for u in raw.replace("\n", ",").split(",") if u.strip()]
        if not urls:
            raise ValueError("http_json: set option 'urls' (or 'url')")
        return HttpJsonReader(urls)


class HttpJsonReader(DataSourceReader):
    def __init__(self, urls: list[str]):
        self.urls = urls

    def partitions(self) -> list[InputPartition]:
        # one task per endpoint: the unit of parallelism AND of retry
        return [InputPartition(i) for i in range(len(self.urls))]

    def read(self, partition: InputPartition):
        from urllib.request import urlopen

        url = self.urls[partition.value]
        with urlopen(url, timeout=60) as resp:
            body = resp.read().decode("utf-8")
        doc = json.loads(body)
        records = doc if isinstance(doc, list) else [doc]
        for r in records:
            yield (json.dumps(r),)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(HttpJsonDataSource)
