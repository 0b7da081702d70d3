"""HTTP source: GET a JSON endpoint, require 200 + non-empty array.

Reference S2: ``Classes/DataSource/Http/HttpSource.php:50-74`` — Guzzle
GET with default header ``Accept: application/json``
(``HttpSourceFactory.php:22``), fails on non-200, non-JSON, or empty
array.

Execution model: the fetch happens **driver-side** (one feed, one
request — like the reference), then parallelizes via
``spark.createDataFrame``. For hundreds of paginated endpoints at scale,
``page_urls`` fans the fetches out to executors with ``mapInPandas``
over a URL frame — each partition fetches its URLs concurrently with the
others; per-URL results concatenate. Both paths avoid any single-task
bottleneck beyond the unavoidable single-feed case.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from wwwision_importservice_spark.errors import DataError
from wwwision_importservice_spark.plans.result import Result
from wwwision_importservice_spark.plans.schema import OptionsSchema
from wwwision_importservice_spark.sources.base import DataSource


def _fetch(url: str, headers: dict[str, str], timeout: float) -> tuple[int, str]:
    try:
        import requests

        resp = requests.get(url, headers=headers, timeout=timeout)
        return resp.status_code, resp.text
    except ImportError:
        from urllib.request import Request, urlopen

        req = Request(url, headers=headers)
        with urlopen(req, timeout=timeout) as resp:  # noqa: S310
            return resp.status, resp.read().decode("utf-8")


class HttpSource(DataSource):
    def __init__(
        self,
        endpoint: str,
        headers: dict[str, str] | None = None,
        timeout: float = 30.0,
        schema: str | None = None,
        page_urls: list[str] | None = None,
    ) -> None:
        self.endpoint = endpoint
        # default header like HttpSourceFactory.php:22
        self.headers = {"Accept": "application/json", **(headers or {})}
        self.timeout = timeout
        self.schema = schema
        self.page_urls = page_urls

    @classmethod
    def options_schema(cls) -> OptionsSchema:
        return (
            OptionsSchema.create()
            .requires("endpoint", "string")
            .has("headers", "array")
            .has("timeout", "float")
            .has("schema", "string")
            .has("page_urls", "array")
            .allow_additional_options()
        )

    def _parse(self, status: int, body: str, url: str) -> list[dict[str, Any]]:
        if status != 200:
            # HttpSource.php:55-58 — non-200 aborts
            raise DataError(f'Failed to fetch "{url}": HTTP {status}')
        try:
            rows = json.loads(body)
        except json.JSONDecodeError as exc:
            raise DataError(f'Response of "{url}" is not valid JSON: {exc}') from exc
        if not isinstance(rows, list):
            raise DataError(f'Response of "{url}" is not a JSON array')
        return rows

    def load(self, spark: SparkSession) -> DataFrame:
        if self.page_urls:
            return self._load_partitioned(spark)
        status, body = _fetch(self.endpoint, self.headers, self.timeout)
        rows = self._parse(status, body, self.endpoint)
        if not rows:
            # HttpSource.php:62-66 — empty feed is an error
            raise DataError(f'Response of "{self.endpoint}" is an empty array')
        if self.schema:
            return spark.createDataFrame(rows, schema=self.schema)
        return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))

    def _load_partitioned(self, spark: SparkSession) -> DataFrame:
        """Executor-side fan-out over many page URLs (requires ``schema``)."""
        if not self.schema:
            raise DataError("page_urls mode requires an explicit schema")
        headers, timeout = self.headers, self.timeout
        url_df = spark.createDataFrame([(u,) for u in self.page_urls], "url string")

        # Self-contained closure (plain-value captures, imports inside):
        # cloudpickle ships it by value so executors don't need this
        # package on their sys.path.
        def fetch_pages(iterator):
            import json as _json

            import pandas as pd

            def fetch(url):
                try:
                    import requests

                    resp = requests.get(url, headers=headers, timeout=timeout)
                    return resp.status_code, resp.text
                except ImportError:
                    from urllib.request import Request, urlopen

                    req = Request(url, headers=headers)
                    with urlopen(req, timeout=timeout) as resp:  # noqa: S310
                        return resp.status, resp.read().decode("utf-8")

            for pdf in iterator:
                frames = []
                for url in pdf["url"]:
                    status, body = fetch(url)
                    if status != 200:
                        raise RuntimeError(f'Failed to fetch "{url}": HTTP {status}')
                    rows = _json.loads(body)
                    if not isinstance(rows, list):
                        raise RuntimeError(f'Response of "{url}" is not a JSON array')
                    if rows:
                        frames.append(pd.DataFrame(rows))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        n = max(1, min(len(self.page_urls), spark.sparkContext.defaultParallelism))
        return url_df.repartition(n).mapInPandas(fetch_pages, schema=self.schema)

    def setup(self, spark: SparkSession) -> Result:
        """HEAD-style reachability probe (HttpSource.php:35-45)."""
        result = Result()
        try:
            status, _ = _fetch(self.endpoint, self.headers, self.timeout)
            if status == 200:
                result.add_notice(f'Endpoint "{self.endpoint}" is reachable')
            else:
                result.add_error(f'Endpoint "{self.endpoint}" returned HTTP {status}')
        except Exception as exc:
            result.add_error(f'Failed to reach "{self.endpoint}": {exc}')
        return result
