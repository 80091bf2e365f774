import numpy as np
import pytest
from click.testing import CliRunner

from skyrim_tpu.cli import main


def test_cli_help():
    result = CliRunner().invoke(main, ["--help"])
    assert result.exit_code == 0
    assert "--lead_time" in result.output


def test_cli_list_models():
    result = CliRunner().invoke(main, ["-l"])
    assert result.exit_code == 0
    for name in ("pangu", "fuxi", "fengwu", "graphcast"):
        assert name in result.output


def test_cli_rejects_bad_model():
    result = CliRunner().invoke(main, ["-m", "nonsense"])
    assert result.exit_code != 0


def test_cli_file_ic_requires_path():
    result = CliRunner().invoke(main, ["-m", "dlwp", "-ic", "file"])
    assert result.exit_code != 0
    assert "ic-path" in result.output.lower() or "ic_path" in result.output.lower()


@pytest.mark.integ
def test_cli_end_to_end(tmp_path):
    """Full CLI run on the smallest model with synthetic ICs."""
    result = CliRunner().invoke(
        main,
        ["-m", "dlwp", "-ic", "synthetic", "--date", "20240501",
         "-lt", "12", "-o", str(tmp_path)],
    )
    assert result.exit_code == 0, result.output
