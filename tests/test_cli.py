"""spark-submit job surface (datatest_spark.cli / jobs/validate_tokens.py)."""

import json

import pytest

from datatest_spark.cli import build_parser, main


@pytest.fixture(scope="module")
def token_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "input")
    rows = [(str(i), [1, 2, 3], 3, "web" if i % 2 else "wiki")
            for i in range(100)]
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ).repartition(2).write.parquet(path)
    return path


def _run(capsys, argv):
    rc = main(argv)
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")][-1]
    return rc, json.loads(out)


class TestValidateJob:
    def test_pass_and_summary(self, spark, token_table, capsys):
        rc, s = _run(capsys, [
            "--input", token_table, "--allowed-sources", "web,wiki",
            "--run-id", "t-pass",
        ])
        assert rc == 0 and s["status"] == "pass"
        assert s["partitions"] == 2 and s["n_rows"] == 100

    def test_fail_exit_code_and_sample(self, spark, token_table, capsys):
        rc, s = _run(capsys, [
            "--input", token_table, "--allowed-sources", "web",
            "--run-id", "t-fail",
        ])
        assert rc == 1 and s["status"] == "fail"
        assert s["failed_partitions"] == 1
        assert s["failed_sample"][0]["partition_key"] == "source=wiki"

    def test_resume_skips_completed(self, spark, token_table, tmp_path, capsys):
        argv = [
            "--input", token_table, "--allowed-sources", "web,wiki",
            "--run-id", "t-resume", "--manifest-dir", str(tmp_path / "m"),
        ]
        rc1, s1 = _run(capsys, argv)
        rc2, s2 = _run(capsys, argv)
        assert (rc1, rc2) == (0, 0)
        assert s1["partitions"] == 2 and s2["partitions"] == 0

    def test_allowed_sources_file(self, spark, token_table, tmp_path, capsys):
        f = tmp_path / "allowed.txt"
        f.write_text("web\nwiki\n")
        rc, s = _run(capsys, [
            "--input", token_table, "--allowed-sources", "@" + str(f),
            "--run-id", "t-file",
        ])
        assert rc == 0 and s["status"] == "pass"

    def test_parser_rejects_missing_input(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["--allowed-sources", "a"])
