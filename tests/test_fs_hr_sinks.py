"""Tests for the filesystem abstraction, BambooHR source, plain FS/callback
sinks, and the Neptune bulk-load publisher orchestration."""

import os

import pytest


SAMPLE_XML = b"""<?xml version="1.0"?>
<directory>
  <fieldset/>
  <employees>
    <employee id="1">
      <field id="workEmail">ada@example.com</field>
      <field id="firstName">Ada</field>
      <field id="lastName">Lovelace</field>
      <field id="displayName">Ada Lovelace</field>
      <field id="department">Engineering</field>
      <field id="jobTitle">Engineer</field>
    </employee>
    <employee id="2">
      <field id="workEmail">grace@example.com</field>
      <field id="firstName">Grace</field>
      <field id="lastName">Hopper</field>
      <field id="displayName">Grace Hopper</field>
      <field id="department">Engineering</field>
      <!-- jobTitle absent -> '' (reference get_field default) -->
    </employee>
  </employees>
</directory>
"""


def test_bamboohr_users_parses_directory(spark):
    from amundsendatabuilder_spark.sources.hr import bamboohr_users

    seen_urls = []

    def fetch(url):
        seen_urls.append(url)
        return SAMPLE_XML

    df = bamboohr_users(spark, fetch, subdomain="acme")
    rows = {r.email: r for r in df.collect()}
    assert seen_urls == [
        "https://api.bamboohr.com/api/gateway.php/acme/v1/employees/directory"]
    assert rows["ada@example.com"].role_name == "Engineer"
    assert rows["ada@example.com"].team_name == "Engineering"
    assert rows["grace@example.com"].name == "Grace Hopper"
    # missing field defaults to '' like the reference's get_field
    assert rows["grace@example.com"].role_name == ""


class _FlakyFS:
    """ls fails with a retriable error n times, then succeeds."""

    def __init__(self, failures, exc=ConnectionError("boom")):
        self.failures = failures
        self.exc = exc
        self.calls = 0

    def ls(self, path):
        self.calls += 1
        if self.calls <= self.failures:
            raise self.exc
        return [path + "/a", path + "/b"]

    def info(self, path):
        self.calls += 1
        if self.calls <= self.failures:
            raise self.exc
        return {"LastModified": 1700000000, "Size": 42}


def test_filesystem_retries_transient_errors():
    from amundsendatabuilder_spark.sources.filesystem import FileSystemClient

    waits = []
    fs = _FlakyFS(failures=2)
    client = FileSystemClient(fs, sleep=waits.append)
    assert client.ls("/data") == ["/data/a", "/data/b"]
    assert fs.calls == 3
    # exponential backoff 1s then 2s, capped at 5s (reference @retry args)
    assert waits == [1.0, 2.0]


def test_filesystem_gives_up_after_max_attempts():
    from amundsendatabuilder_spark.sources.filesystem import FileSystemClient

    fs = _FlakyFS(failures=10)
    client = FileSystemClient(fs, sleep=lambda _s: None)
    with pytest.raises(ConnectionError):
        client.ls("/data")
    assert fs.calls == 3  # stop_max_attempt_number=3


def test_filesystem_client_error_not_retried():
    from amundsendatabuilder_spark.sources.filesystem import FileSystemClient

    fs = _FlakyFS(failures=10, exc=FileNotFoundError("nope"))
    client = FileSystemClient(fs, sleep=lambda _s: None)
    with pytest.raises(FileNotFoundError):
        client.ls("/missing")
    assert fs.calls == 1  # client-side errors surface immediately


def test_filesystem_info_and_is_file(spark):
    from amundsendatabuilder_spark.sources.filesystem import (
        FileSystemClient, file_metadata_df)

    class FS:
        def ls(self, path):
            return [path] if path.endswith(".csv") else [path + "/x"]

        def info(self, path):
            return {"LastModified": 1700000001, "Size": 7}

    client = FileSystemClient(FS())
    assert client.is_file("/d/f.csv") is True
    assert client.is_file("/d") is False
    md = client.info("/d/f.csv")
    assert (md.path, md.last_updated, md.size) == ("/d/f.csv", 1700000001, 7)

    df = file_metadata_df(spark, client, ["/a.csv", "/b.csv"])
    assert df.columns == ["path", "last_updated", "size"]
    assert df.count() == 2


def test_write_single_csv(spark, tmp_path):
    from amundsendatabuilder_spark.sinks.fs_sink import write_single_csv

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, name string")
    out = write_single_csv(df, str(tmp_path / "out" / "records.csv"))
    with open(out) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "id,name"  # header from schema order
    assert sorted(lines[1:]) == ["1,a", "2,b", "3,c"]
    assert os.path.isfile(out)


def test_generic_load_applies_callback(spark, tmp_path):
    from amundsendatabuilder_spark.sinks.fs_sink import generic_load

    out_dir = str(tmp_path / "cb")
    os.makedirs(out_dir)

    def callback(row):
        # executor-side side effect observable from the driver
        with open(os.path.join(out_dir, f"{row.id}.txt"), "w") as fh:
            fh.write(row.name)

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    generic_load(df, callback)
    assert sorted(os.listdir(out_dir)) == ["1.txt", "2.txt"]
    assert open(os.path.join(out_dir, "1.txt")).read() == "a"


class _FakeBulkClient:
    def __init__(self, statuses, load_response=None):
        self.statuses = list(statuses)
        self.load_response = load_response or {"payload": {"loadId": "L1"}}
        self.uploaded = []
        self.polls = 0

    def upload(self, f, s3_object_key):
        self.uploaded.append(s3_object_key)

    def load(self, s3_object_key, failOnError):
        self.load_key = s3_object_key
        return self.load_response

    def load_status(self, load_id, errors):
        status = self.statuses[min(self.polls, len(self.statuses) - 1)]
        self.polls += 1
        payload = {"overallStatus": {"status": status}}
        if status == "LOAD_FAILED":
            payload["errors"] = {"errorLogs": [{"errorCode": "E1"}]}
        return {"payload": payload}


def _stage_csvs(tmp_path, n=2):
    d = tmp_path / "staged"
    d.mkdir()
    for i in range(n):
        (d / f"part-{i}.csv").write_text("~id\nv1\n")
    return str(d)


def test_neptune_publish_bulk_polls_to_completion(tmp_path):
    from amundsendatabuilder_spark.sinks.neptune_csv import publish_bulk

    client = _FakeBulkClient(["LOAD_IN_PROGRESS", "LOAD_COMPLETED"])
    result = publish_bulk(_stage_csvs(tmp_path), "base/amundsen", "2026_01_01",
                          client, sleep=lambda _s: None)
    assert result == {"loaded": True, "load_id": "L1",
                      "status": "LOAD_COMPLETED", "errors": []}
    assert client.uploaded == ["base/amundsen/2026_01_01/part-0.csv",
                               "base/amundsen/2026_01_01/part-1.csv"]
    assert client.load_key == "base/amundsen/2026_01_01"
    assert client.polls == 2


def test_neptune_publish_bulk_collects_errors(tmp_path):
    from amundsendatabuilder_spark.sinks.neptune_csv import publish_bulk

    client = _FakeBulkClient(["LOAD_FAILED"])
    result = publish_bulk(_stage_csvs(tmp_path), "b", "t", client,
                          sleep=lambda _s: None)
    assert result["status"] == "LOAD_FAILED"
    assert result["errors"] == [{"errorCode": "E1"}]


def test_neptune_publish_bulk_requires_load_id(tmp_path):
    from amundsendatabuilder_spark.sinks.neptune_csv import publish_bulk

    client = _FakeBulkClient(["LOAD_COMPLETED"], load_response={"payload": {}})
    with pytest.raises(RuntimeError, match="Failed to load csv"):
        publish_bulk(_stage_csvs(tmp_path), "b", "t", client,
                     sleep=lambda _s: None)


def test_neptune_publish_bulk_noop_without_files(tmp_path):
    from amundsendatabuilder_spark.sinks.neptune_csv import publish_bulk

    empty = tmp_path / "empty"
    empty.mkdir()
    client = _FakeBulkClient(["LOAD_COMPLETED"])
    result = publish_bulk(str(empty), "b", "t", client, sleep=lambda _s: None)
    assert result["loaded"] is False
    assert client.uploaded == []
