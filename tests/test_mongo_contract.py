"""MongoDB connector contract tests (round-5 verdict item 6).

No Mongo server exists in this sandbox, so — the way JDBC got a real
embedded-Derby round-trip — the Mongo path gets the next-best pin: recorder
doubles standing in for DataFrameReader/DataFrameWriter capture the EXACT
configuration the connector hands Spark (format name, connection.uri /
database / collection options, save mode). A rename or option typo that
would only surface against a live server fails here instead.

The option names are the spark-mongodb connector's published surface
(format "mongodb", options "connection.uri", "database", "collection"),
mirroring reference src/data_processor.py:226-255 (scan) and :155-179
(sink).
"""

from __future__ import annotations


class _RecorderReader:
    def __init__(self):
        self.fmt = None
        self.options: dict[str, str] = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        self.loaded = True
        return "LOADED-DF"


class _FakeSpark:
    def __init__(self, reader):
        self.read = reader


class _RecorderWriter:
    def __init__(self):
        self.fmt = None
        self.options: dict[str, str] = {}
        self.save_mode = None
        self.saved = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def mode(self, m):
        self.save_mode = m
        return self

    def save(self):
        self.saved = True


class _FakeDF:
    def __init__(self, writer):
        self.write = writer


def test_load_mongodb_reader_configuration():
    from candyspark.sources.readers import load_mongodb

    rec = _RecorderReader()
    out = load_mongodb(
        _FakeSpark(rec),
        uri="mongodb://host:27017",
        database="candy",
        collection="transactions_20240101",
    )
    assert out == "LOADED-DF" and rec.loaded
    assert rec.fmt == "mongodb"
    assert rec.options == {
        "connection.uri": "mongodb://host:27017",
        "database": "candy",
        "collection": "transactions_20240101",
    }


def test_save_mongodb_writer_configuration():
    from candyspark.sources.sinks import save_mongodb

    rec = _RecorderWriter()
    save_mongodb(
        _FakeDF(rec),
        uri="mongodb://host:27017",
        database="candy",
        collection="daily_summary",
        mode="append",
    )
    assert rec.saved
    assert rec.fmt == "mongodb"
    assert rec.save_mode == "append"
    assert rec.options == {
        "connection.uri": "mongodb://host:27017",
        "database": "candy",
        "collection": "daily_summary",
    }


def test_save_mongodb_default_mode_is_overwrite():
    from candyspark.sources.sinks import save_mongodb

    rec = _RecorderWriter()
    save_mongodb(_FakeDF(rec), "mongodb://h", "db", "col")
    assert rec.save_mode == "overwrite"
