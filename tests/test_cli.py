"""CLI smoke tests (reference tests/test_cli.py pattern)."""

from click.testing import CliRunner

from lettuce_tpu.cli import main


def test_cli_help():
    runner = CliRunner()
    result = runner.invoke(main, ["--help"])
    assert result.exit_code == 0
    assert "benchmark" in result.output
    assert "convergence" in result.output


def test_cli_benchmark_help():
    runner = CliRunner()
    result = runner.invoke(main, ["benchmark", "--help"])
    assert result.exit_code == 0
    assert "--resolution" in result.output


def test_cli_version():
    runner = CliRunner()
    result = runner.invoke(main, ["--version"])
    assert result.exit_code == 0
    assert "lettuce-tpu" in result.output


def test_cli_rejects_bad_precision():
    runner = CliRunner()
    result = runner.invoke(main, ["--precision", "quadruple", "benchmark"])
    assert result.exit_code == 2
    assert "Invalid value" in result.output


def test_cli_tiny_benchmark_runs():
    runner = CliRunner()
    result = runner.invoke(main, ["--no-tpu", "benchmark", "-r", "16",
                                  "-s", "2"])
    assert result.exit_code == 0, result.output
    assert "MLUPS" in result.output
