"""CLI adhoc-query mode end-to-end (reference bin/main.rs parity)."""

from zikeiretsu_rs_spark import cli
from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine

from test_datetime_util import nanos


def test_adhoc_query_and_error_paths(spark, tmp_ctx, capsys):
    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("m", [FieldType.FLOAT64])
    base = nanos(2024, 1, 1)
    store.push_multi([DataPoint.new(base + i * NANOS_PER_SEC, float(i)) for i in range(3)])
    store.persist()

    rc = cli.run_query(engine, "with cols = [v] select v from m where ts = '2024-01-01'")
    out = capsys.readouterr().out
    assert rc == 0
    assert "2024-01-01T00:00:01" in out and "1.0" in out

    # catalog built-in
    rc = cli.run_query(engine, "select * from .metrics")
    assert rc == 0
    assert "m" in capsys.readouterr().out

    # parity error surface: data query without WHERE -> nonzero exit
    rc = cli.run_query(engine, "select * from m")
    err = capsys.readouterr().err
    assert rc == 1
    assert "EmptyFilterCondition" in err


def test_config_file_context(tmp_path):
    cfg = tmp_path / "ctx.toml"
    cfg.write_text(
        f'data_dir = "{tmp_path}/wh"\n'
        'default_database = "db1"\n'
        '[[databases]]\nname = "db1"\n'
    )
    from zikeiretsu_rs_spark.catalog.context import DBContext

    ctx = DBContext.from_config_file(str(cfg))
    assert ctx.default_database == "db1"
    assert ctx.db_dir().endswith("wh/db1")
