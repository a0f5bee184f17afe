"""verify_parity CLI: the north-star ≤1e-3 mask-IoU bit-check as a
command (VERDICT r2 item 7; reference forward: src/test.py:16-50)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rsis_tpu.cli.verify_parity import main
from rsis_tpu.models import torch_ref as tr


def _export(sd, path):
    np.savez(path, **{k: v.detach().numpy() for k, v in sd.items()})


def test_parity_ok_on_matching_weights(tmp_path, capsys):
    torch.manual_seed(0)
    enc = tr.FeatureExtractor(tr.ResNetTaps(tr.BasicBlock, (3, 4, 6, 3)),
                              (512, 256, 128, 64, 64), hidden_size=16)
    tr.randomize_bn_stats(enc, seed=1)
    dec = tr.RSISDecoder(hidden_size=16, num_classes=5)
    enc_path, dec_path = str(tmp_path / "enc.npz"), str(tmp_path / "dec.npz")
    _export(enc.state_dict(), enc_path)
    _export(dec.state_dict(), dec_path)

    rc = main([enc_path, dec_path, "-base_model", "resnet34",
               "-hidden_size", "16", "-num_classes", "5",
               "-imsize", "64", "-maxseqlen", "3", "-n_images", "1"])
    out = capsys.readouterr().out
    assert "PARITY OK" in out, out
    assert rc == 0


def test_parity_detects_importer_bug(tmp_path, capsys, monkeypatch):
    """Both sides read the same files, so the CLI's job is catching
    importer/forward divergence; simulate an importer regression and
    assert it goes red."""
    from rsis_tpu.models import torch_import as ti

    torch.manual_seed(0)
    enc = tr.FeatureExtractor(tr.ResNetTaps(tr.BasicBlock, (3, 4, 6, 3)),
                              (512, 256, 128, 64, 64), hidden_size=16)
    dec = tr.RSISDecoder(hidden_size=16, num_classes=5)
    enc_path, dec_path = str(tmp_path / "enc.npz"), str(tmp_path / "dec.npz")
    _export(enc.state_dict(), enc_path)
    _export(dec.state_dict(), dec_path)

    orig = ti.import_decoder

    def broken(sd):
        p = orig(sd)
        p["conv_out"]["bias"] = p["conv_out"]["bias"] + 1.0
        return p

    monkeypatch.setattr(ti, "import_decoder", broken)
    rc = main([enc_path, dec_path, "-base_model", "resnet34",
               "-hidden_size", "16", "-num_classes", "5",
               "-imsize", "64", "-maxseqlen", "3", "-n_images", "1"])
    out = capsys.readouterr().out
    assert "PARITY EXCEEDED" in out, out
    assert rc == 1
