"""S15 remote-execution boundary: the Arrow-over-HTTP server/client
pair standing in for the reference's Arrow Flight interface
(arrow_flight_server/mod.rs:28-106, do_get_handler.rs:16-55): a client
with NO Spark session submits a dialect query string and receives the
result as an Arrow stream."""

import pytest

from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine
from zikeiretsu_rs_spark.server import QueryHttpServer, execute_remote

from test_datetime_util import nanos


@pytest.fixture
def served_engine(spark, tmp_ctx):
    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("trades", [FieldType.FLOAT64, FieldType.FLOAT64])
    base = nanos(2024, 1, 1)
    store.push_multi(
        [
            DataPoint.new(base + i * 1800 * NANOS_PER_SEC, 100.0 + i, 0.5)
            for i in range(48)
        ]
    )
    store.persist()
    server = QueryHttpServer(engine).start()
    yield engine, server, base
    server.stop()


class TestRemoteBoundary:
    def test_query_roundtrip_matches_local(self, served_engine):
        engine, server, base = served_engine
        q = (
            "with cols = [price, size], format_datetime = false "
            "select price, size from trades where ts = '2024-01-01 06:00'"
        )
        table = execute_remote(server.url, q, now_nanos=base)
        local = engine.execute_to_df(q, now_nanos=base).toPandas()
        remote = table.to_pandas()
        assert list(remote.columns) == list(local.columns)
        assert remote.equals(local)
        assert len(remote) == 2  # hour-accuracy '=' widens to one hour

    def test_rfc3339_rendering_crosses_the_wire(self, served_engine):
        engine, server, base = served_engine
        q = (
            "with cols = [price, size], tz = +09:00 "
            "select price from trades where ts = '2024-01-01 09:00'"
        )
        table = execute_remote(server.url, q, now_nanos=base)
        ts = table.column("ts").to_pylist()
        assert all(t.endswith("+09:00") for t in ts)

    def test_parse_error_propagates(self, served_engine):
        _, server, base = served_engine
        with pytest.raises(RuntimeError, match="remote query failed"):
            execute_remote(server.url, "select from nothing where", now_nanos=base)

    def test_concurrent_clients(self, served_engine):
        from concurrent.futures import ThreadPoolExecutor

        _, server, base = served_engine
        q = (
            "with format_datetime = false "
            "select * from trades where ts >= '2024-01-01'"
        )
        with ThreadPoolExecutor(4) as ex:
            tables = list(
                ex.map(lambda _: execute_remote(server.url, q, now_nanos=base), range(4))
            )
        assert all(t.num_rows == 48 for t in tables)
