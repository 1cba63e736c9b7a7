"""REST API source — the reference's RestApiQuery chain
(databuilder/rest_api/rest_api_query.py) re-expressed for Spark.

Semantics reproduced (reference :134-193):
- nested-loop 1:1 / 1:N join across endpoints: each outer record's fields
  are substituted into the inner URL (``url.format(**record)``), the JSON
  response is field-extracted, and result records are outer ⨝ inner;
- ``skip_no_result`` => inner-join (outer rows with empty inner dropped);
  default => left-join (outer fields pass through, inner fields null);
  ``fail_no_result`` => raise (reference :148-150,207);
- retry with exponential backoff ×5 (reference :195-205).

Execution: the fetch runs inside ``mapInPandas`` so each PARTITION of seed
records issues its own HTTP calls — executor-parallel, rate-limited per
partition, instead of the reference's single-threaded driver loop. The
fetch callable is injected (tests pass a fake; production passes
requests.get), keeping the operator testable offline.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

JsonFetch = Callable[[str], dict | list | None]


def _retry_fetch(fetch: JsonFetch, url: str, attempts: int = 5,
                 backoff_base: float = 1.0, backoff_cap: float = 10.0):
    """Exponential backoff ×5 (reference: rest_api_query.py:195-205)."""
    last_err: Exception | None = None
    for i in range(attempts):
        try:
            return fetch(url)
        except Exception as e:  # noqa: BLE001 — mirror retry_any_error
            last_err = e
            if i < attempts - 1:
                time.sleep(min(backoff_base * (2 ** i), backoff_cap))
    raise RuntimeError(f"REST fetch failed after {attempts} attempts: {url}") from last_err


def _extract(payload, json_path: str) -> list[dict]:
    """Minimal dotted-path extraction standing in for the reference's
    jsonpath_rw usage (:126,152-155): 'a.b[*].c'-style paths over
    dict/list payloads; '[*]' fans out."""
    def walk(obj, parts: list[str]) -> list:
        if not parts:
            return obj if isinstance(obj, list) else [obj]
        head, rest = parts[0], parts[1:]
        if head == "[*]":
            if not isinstance(obj, list):
                return []
            out = []
            for item in obj:
                out.extend(walk(item, rest))
            return out
        if isinstance(obj, dict) and head in obj:
            return walk(obj[head], rest)
        return []

    if json_path in (".", ""):
        # root-object extraction (reference json_path '[state,completed_at]'
        # on a single-entity payload, e.g. a Mode report-run resource)
        return [payload] if isinstance(payload, dict) else []
    parts: list[str] = []
    for chunk in json_path.split("."):
        if chunk.endswith("[*]"):
            parts.extend([chunk[:-3], "[*]"] if chunk[:-3] else ["[*]"])
        else:
            parts.append(chunk)
    found = walk(payload, parts)
    return [x for x in found if isinstance(x, dict)]


def _dig_field(item: dict, path: str):
    """Dotted lookup inside one extracted record — the reference reaches
    through '_links.last_run.href'-style sub-paths in its OR json_paths."""
    cur = item
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def rest_api_join(seeds: DataFrame, url_template: str, json_path: str,
                  field_names: "list[str] | dict[str, str]", fetch: JsonFetch,
                  skip_no_result: bool = False, fail_no_result: bool = False,
                  attempts: int = 5, skip_on_error: bool = False) -> DataFrame:
    """outer ⨝ REST(inner): one HTTP call per outer row, executed
    executor-side per partition via mapInPandas (Arrow-batched).

    ``field_names`` is either a list of top-level item keys, or a dict
    of output column -> dotted path inside the item (the reference's
    '(_embedded.reports[*]._links.last_run.href)' OR-paths become
    ``{"last_run_resource_path": "_links.last_run.href"}`` here).
    ``skip_on_error=True`` treats a fetch that still fails after retries
    as an empty result (the reference's HttpFailureSkipOnStatus 404
    handler on user-resource hops) instead of failing the job.

    Returns seeds' columns plus the extracted fields (string-typed, as
    the reference treats extracted fields)."""
    import pandas as pd

    fields = (dict(field_names) if isinstance(field_names, dict)
              else {f: f for f in field_names})
    out_names = list(fields)
    seed_fields = seeds.schema.fields
    out_schema = T.StructType(
        list(seed_fields)
        + [T.StructField(f, T.StringType(), True) for f in out_names])
    seed_cols = [f.name for f in seed_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                url = url_template.format(**rec)
                try:
                    payload = _retry_fetch(fetch, url, attempts)
                except Exception:
                    if not skip_on_error:
                        raise
                    payload = None
                inner = _extract(payload, json_path) if payload is not None else []
                if not inner:
                    if fail_no_result:
                        raise RuntimeError(f"no result for {url}")
                    if skip_no_result:
                        continue  # inner-join semantics
                    rows.append({**rec, **{f: None for f in out_names}})
                    continue
                for item in inner:  # 1:N fan-out (reference :168-185)
                    vals = {f: _dig_field(item, p) for f, p in fields.items()}
                    rows.append({**rec, **{f: None if v is None else str(v)
                                           for f, v in vals.items()}})
            yield pd.DataFrame(rows, columns=seed_cols + out_names) if rows \
                else pd.DataFrame(columns=seed_cols + out_names)

    return seeds.mapInPandas(run, out_schema)


def compute_sub_records(result_list: list, field_names: list[str],
                        json_path_contains_or: bool = False) -> list[list]:
    """Reshape a flat JSONPath multi-field extraction into records
    (reference: rest_api_query.py:207-250 ``_compute_sub_records``).

    AND(,) paths interleave fields record-by-record — chunk every
    len(field_names) values; OR(|) paths list all of field 1, then all of
    field 2, … — stride across the list. Driver-side list reshaping (the
    payloads are single API responses); the fan-out into a DataFrame
    happens afterwards via ``spark.createDataFrame``.
    """
    if not field_names:
        raise ValueError("Field names should not be empty")
    n = len(field_names)
    if not json_path_contains_or:
        return [result_list[i:i + n] for i in range(0, len(result_list), n)]
    num_subresult = int(len(result_list) / n)
    return [[result_list[j] for j in range(i, len(result_list), num_subresult)]
            for i in range(num_subresult)]


def paginated_fetch(fetch: JsonFetch, url_template: str,
                    page_param: str = "page", max_record_size: int = 30,
                    max_pages: int = 1000) -> list[dict]:
    """Page-number pagination with the full-page heuristic (reference:
    rest_api/mode_analytics/mode_paginated_rest_api_query.py:28-71 — stop
    when a page returns fewer than max_record_size records). Driver-side:
    used to build the SEED DataFrame, which then fans out executor-side."""
    out: list[dict] = []
    for page in range(1, max_pages + 1):
        payload = _retry_fetch(fetch, url_template.format(**{page_param: page}))
        records = payload if isinstance(payload, list) else []
        out.extend(r for r in records if isinstance(r, dict))
        if len(records) < max_record_size:
            break
    return out
