"""Argparse sanity: every CLI exposes --help without import-time crashes."""

import pytest


@pytest.mark.parametrize(
    "mod",
    [
        "arttts_tpu.cli.train",
        "arttts_tpu.cli.synthesize",
        "arttts_tpu.cli.vocode",
        "arttts_tpu.cli.score",
        "arttts_tpu.cli.pipeline",
        "arttts_tpu.cli.encode_audio",
        "arttts_tpu.cli.generate_phnm3",
    ],
)
def test_cli_help(mod):
    import importlib

    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as e:
        m.main(["--help"])
    assert e.value.code == 0
