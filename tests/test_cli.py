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


class _ScriptedInput:
    def __init__(self, lines):
        self.lines = list(lines)
        self.prompts = []

    def __call__(self, prompt=""):
        self.prompts.append(prompt)
        if not self.lines:
            raise EOFError
        return self.lines.pop(0)


class _RecordingEngine:
    def __init__(self):
        self.queries = []

    def execute(self, q):
        self.queries.append(q)
        return "ok"


class TestReplParity:
    """REPL editing behaviors vs repl/mod.rs:28-67 + validator.rs:
    multiline-until-';' (trailing blanks allowed), persistent history
    (load at start, save on every exit path, one entry per submitted
    statement, ignore-space), 'bye' on EOF. Driven by scripting
    input(); the line EDITING itself is GNU readline's, which the
    reference also delegates (to rustyline)."""

    def _run(self, monkeypatch, lines, hist):
        import builtins
        import readline

        readline.clear_history()
        eng = _RecordingEngine()
        feeder = _ScriptedInput(lines)
        monkeypatch.setattr(builtins, "input", feeder)
        rc = cli.repl(eng, history_file=str(hist))
        return rc, eng, feeder

    def test_multiline_until_semicolon_and_bye(
        self, monkeypatch, tmp_path, capsys
    ):
        rc, eng, feeder = self._run(
            monkeypatch,
            ["select price", "from trades", "where ts >= '2024-01-01';  ",
             "select 1;"],
            tmp_path / "h",
        )
        assert rc == 0
        # two statements: the 3-line one (trailing blanks after ';'
        # accepted — the validator's [ \t]* rule) and the 1-liner
        assert eng.queries == [
            "select price\nfrom trades\nwhere ts >= '2024-01-01';  ",
            "select 1;",
        ]
        # continuation prompt while the statement is open
        assert feeder.prompts[:4] == [">> ", "... ", "... ", ">> "]
        assert capsys.readouterr().out.rstrip().endswith("bye")

    def test_history_saved_one_entry_per_statement(
        self, monkeypatch, tmp_path
    ):
        hist = tmp_path / "h"
        self._run(
            monkeypatch,
            ["select a", "from m;", "  select secret;", "select 2;", "exit"],
            hist,
        )
        entries = hist.read_text().splitlines()
        # multiline flattened to ONE entry; leading-space statement
        # ignored (history_ignore_space)
        assert entries == ["select a from m;", "select 2;"]

    def test_fragments_and_exit_line_not_persisted(
        self, monkeypatch, tmp_path
    ):
        """ADVICE r07: on exit with an unfinished multiline buffer,
        the per-line fragments GNU readline auto-recorded since the
        last submitted statement — and the 'exit' line itself — must
        be trimmed before save_history, leaving only collapsed
        per-statement entries. Simulated with a tty-like input that
        add_history()s every non-blank line, as GNU readline does."""
        import builtins
        import readline

        def run_tty(lines, hist):
            readline.clear_history()
            eng = _RecordingEngine()
            feeder = _ScriptedInput(lines)

            def tty_input(prompt=""):
                line = feeder(prompt)
                if line.strip():
                    readline.add_history(line)
                return line

            monkeypatch.setattr(builtins, "input", tty_input)
            rc = cli.repl(eng, history_file=str(hist))
            assert rc == 0
            return hist.read_text().splitlines()

        # EOF with a half-typed statement: fragments dropped
        h1 = tmp_path / "h_eof"
        assert run_tty(
            ["select a;", "select partial", "still open"], h1
        ) == ["select a;"]
        # 'exit' typed: the exit line itself is not history
        h2 = tmp_path / "h_exit"
        assert run_tty(["select b;", "exit"], h2) == ["select b;"]
        readline.clear_history()

    def test_history_loaded_on_start(self, monkeypatch, tmp_path):
        import readline

        hist = tmp_path / "h"
        hist.write_text("select old;\n")
        self._run(monkeypatch, ["select new;", "exit"], hist)
        assert hist.read_text().splitlines() == ["select old;", "select new;"]
        readline.clear_history()


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


def test_multi_database_routing(spark, tmp_path):
    """`with database = x` routes to the named database's warehouse
    (DBContext parity with engine/context.rs:122-137)."""
    from zikeiretsu_rs_spark.catalog.context import Database, DBContext

    ctx = DBContext(
        data_dir=str(tmp_path / "wh"),
        default_database="main",
        databases={"main": Database("main"), "alt": Database("alt")},
    )
    engine = Engine(spark, ctx)
    base = nanos(2024, 1, 1)
    s_main = engine.writable_store("m", [FieldType.FLOAT64])
    s_main.push_multi([DataPoint.new(base, 1.0)])
    s_main.persist()
    s_alt = engine.writable_store("m", [FieldType.FLOAT64], database="alt")
    s_alt.push_multi([DataPoint.new(base, 2.0), DataPoint.new(base + 1, 3.0)])
    s_alt.persist()

    q = "with cols = [v], format_datetime = false select v from m where ts >= '2023-01-01'"
    df_main = engine.execute_to_df(q, now_nanos=base)
    df_alt = engine.execute_to_df(
        q.replace("with ", "with db = alt, "), now_nanos=base
    )
    assert sorted(r["v"] for r in df_main.collect()) == [1.0]
    assert sorted(r["v"] for r in df_alt.collect()) == [2.0, 3.0]
