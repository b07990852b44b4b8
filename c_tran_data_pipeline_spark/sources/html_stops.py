"""S2: HTML stop-event table scan (reference stop_producer.py:77-102,
parseStop.py:12-33).

The reference BeautifulSoup-parses one page driver-side: per-trip ``<h3>``
headings ("... for trip <trip_id> ...", trip id = 5th token) each followed
by a ``<table>`` whose first ``<th>`` row names the columns and first
``<td>`` row holds the values.

Spark-first shape: pages land as (url, html) rows — at 100 TB of crawl
output that's ``spark.read.text``/parquet shards — and parsing is a
per-row UDF returning ``array<struct>`` that we explode (the UDTF shape,
SURVEY.md §2.10). Parsing is stdlib html.parser (no bs4 in the image);
a Python UDF is acceptable here because HTML parsing is genuinely
string-irregular — the one place SURVEY.md §2.10 sanctions real Python —
and it's Arrow-batched at the DataFrame boundary."""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _StopEventHTMLParser(HTMLParser):
    """Collects (heading_text, [(th...)], [(td...)]) groups."""

    def __init__(self):
        super().__init__()
        self.records: list[dict[str, str]] = []
        self._in_h3 = False
        self._h3_text = ""
        self._current_trip: str | None = None
        self._in_cell = False
        self._cell_kind = ""
        self._headers: list[str] = []
        self._values: list[str] = []
        self._row_done = False

    def handle_starttag(self, tag, attrs):
        if tag == "h3":
            self._in_h3 = True
            self._h3_text = ""
        elif tag in ("th", "td"):
            self._in_cell = True
            self._cell_kind = tag
        elif tag == "table":
            self._headers, self._values, self._row_done = [], [], False

    def handle_endtag(self, tag):
        if tag == "h3":
            self._in_h3 = False
            toks = self._h3_text.split()
            # trip id = 5th token of the heading (stop_producer.py:78-79)
            self._current_trip = toks[4] if len(toks) > 4 else None
        elif tag in ("th", "td"):
            self._in_cell = False
        elif tag == "table":
            if self._current_trip is not None and self._headers:
                rec = dict(zip(self._headers, self._values))
                rec["trip_id"] = self._current_trip
                self.records.append(rec)

    def handle_data(self, data):
        if self._in_h3:
            self._h3_text += data
        elif self._in_cell:
            if self._cell_kind == "th":
                self._headers.append(data.strip())
            elif len(self._values) < len(self._headers):
                # first <td> row only, zipped th↔td like the reference
                self._values.append(data.strip())


STOP_EVENT_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("trip_id", T.StringType()),
            T.StructField("vehicle_number", T.StringType()),
            T.StructField("route_number", T.StringType()),
            T.StructField("direction", T.StringType()),
            T.StructField("service_key", T.StringType()),
        ]
    )
)


def _parse_page(html: str | None) -> list[tuple[str, str, str, str, str]]:
    if not html:
        return []
    p = _StopEventHTMLParser()
    p.feed(html)
    return [
        (
            r.get("trip_id"),
            r.get("vehicle_number"),
            r.get("route_number"),
            r.get("direction"),
            r.get("service_key"),
        )
        for r in p.records
    ]


parse_stop_events_udf = F.udf(_parse_page, STOP_EVENT_STRUCT)


def stop_events_from_html(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(…, html) rows → one raw stop-event row per trip table: the
    UDF-returns-array + explode UDTF pattern. Output schema ==
    schemas.RAW_STOP_EVENT, ready for conform_stop_events."""
    return pages.select(
        F.explode(parse_stop_events_udf(F.col(html_col))).alias("ev")
    ).select("ev.*")


class StopEventsUDTF:
    """The SAME parse as a NATIVE Spark 4 Python UDTF (@F.udtf): one
    lateral row per trip table, engine-managed fan-out instead of the
    returns-array + explode composition above. Both paths share
    _StopEventHTMLParser, and tests pin them row-identical; the UDTF
    form is what a Spark-4-native pipeline would write today, while the
    explode form remains for engines/contexts without UDTF support.
    eval() yields tuples matching RAW_STOP_EVENT's five columns."""

    def eval(self, html: str | None):  # noqa: D102 — UDTF contract
        if not html:
            return
        p = _StopEventHTMLParser()
        p.feed(html)
        for r in p.records:
            yield (
                r.get("trip_id"),
                r.get("vehicle_number"),
                r.get("route_number"),
                r.get("direction"),
                r.get("service_key"),
            )


def stop_events_from_html_udtf(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(…, html) rows → raw stop-event rows via the native UDTF + LATERAL
    join (Spark 4 surface). Output schema == the explode path's."""
    spark = pages.sparkSession
    fields = "trip_id string, vehicle_number string, route_number string, direction string, service_key string"
    parse = F.udtf(StopEventsUDTF, returnType=fields)
    spark.udtf.register("parse_stop_events", parse)
    pages.createOrReplaceTempView("stop_pages_udtf_in")
    return spark.sql(
        f"SELECT t.* FROM stop_pages_udtf_in, "
        f"LATERAL parse_stop_events({html_col}) t"
    )
