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
      allowed_schemes — comma-separated scheme allowlist, default
             ``http,https``. ``file`` must be opted into explicitly
             (tests do); without the allowlist, a source whose url
             list is fed from untrusted config would be an SSRF /
             local-file-read primitive running ON CLUSTER HOSTS.
      max_bytes — per-response size cap, default 64 MiB. Responses
             are streamed in chunks and the fetch aborts past the cap
             instead of buffering an unbounded body executor-side.

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
        schemes = tuple(
            s.strip().lower()
            for s in (self.options.get("allowed_schemes") or "http,https").split(",")
            if s.strip()
        )
        max_bytes = int(self.options.get("max_bytes") or 64 * 1024 * 1024)
        # Validate schemes at PLAN time so a bad url fails the query, not
        # a retried task on some executor.
        for u in urls:
            scheme = u.split(":", 1)[0].lower() if ":" in u else ""
            if scheme not in schemes:
                raise ValueError(
                    f"http_json: scheme {scheme!r} not in allowed_schemes {schemes} "
                    f"(url: {u}); pass option('allowed_schemes', ...) to opt in"
                )
        return HttpJsonReader(urls, max_bytes)


class HttpJsonReader(DataSourceReader):
    def __init__(self, urls: list[str], max_bytes: int = 64 * 1024 * 1024):
        self.urls = urls
        self.max_bytes = max_bytes

    def partitions(self) -> list[InputPartition]:
        # one task per endpoint: the unit of parallelism AND of retry
        return [InputPartition(i) for i in range(len(self.urls))]

    def read(self, partition: InputPartition):
        from urllib.request import urlopen

        url = self.urls[partition.value]
        chunks: list[bytes] = []
        size = 0
        with urlopen(url, timeout=60) as resp:
            # Stream-decode in 1 MiB chunks: the cap aborts a runaway
            # body after max_bytes instead of after resp.read() has
            # already buffered it all.
            while True:
                chunk = resp.read(1024 * 1024)
                if not chunk:
                    break
                size += len(chunk)
                if size > self.max_bytes:
                    raise ValueError(
                        f"http_json: response from {url} exceeds max_bytes={self.max_bytes}"
                    )
                chunks.append(chunk)
        doc = json.loads(b"".join(chunks).decode("utf-8"))
        records = doc if isinstance(doc, list) else [doc]
        for r in records:
            yield (json.dumps(r),)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(HttpJsonDataSource)
