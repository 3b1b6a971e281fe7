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


def test_cli_device_pinning():
    """-i/--device-id pins to jax.devices()[i] (reference -i/--gpu-id
    parity); out-of-range ids are rejected with a clear error."""
    runner = CliRunner()
    result = runner.invoke(main, ["--no-tpu", "-i", "1", "benchmark",
                                  "-r", "16", "-s", "2"])
    assert result.exit_code == 0, result.output  # conftest gives 8 CPUs
    assert "MLUPS" in result.output

    result = runner.invoke(main, ["--no-tpu", "--gpu-id", "2", "benchmark",
                                  "-r", "16", "-s", "2"])
    assert result.exit_code == 0, result.output  # reference alias

    result = runner.invoke(main, ["--no-tpu", "-i", "99", "benchmark",
                                  "-r", "16", "-s", "2"])
    assert result.exit_code == 2
    assert "out of range" in result.output


def test_cli_benchmark_mesh():
    """--mesh shards the benchmark grid over a device mesh (8 virtual
    CPU devices from conftest); too-large meshes are rejected."""
    runner = CliRunner()
    result = runner.invoke(main, ["--no-tpu", "benchmark", "-r", "16",
                                  "-s", "2", "--mesh", "8"])
    assert result.exit_code == 0, result.output
    assert "MLUPS" in result.output

    result = runner.invoke(main, ["--no-tpu", "benchmark", "-r", "16",
                                  "-s", "2", "--mesh", "4,2"])
    assert result.exit_code == 0, result.output

    result = runner.invoke(main, ["--no-tpu", "benchmark", "-r", "16",
                                  "-s", "2", "--mesh", "64"])
    assert result.exit_code == 2

    # malformed mesh strings and non-dividing resolutions are clear
    # usage errors, not tracebacks
    result = runner.invoke(main, ["--no-tpu", "benchmark", "-r", "16",
                                  "-s", "2", "--mesh", "4x2"])
    assert result.exit_code == 2
    result = runner.invoke(main, ["--no-tpu", "benchmark", "-r", "18",
                                  "-s", "2", "--mesh", "4"])
    assert result.exit_code == 2
