"""Produce PARITY.md: the standing checkpoint-parity artifact.

BASELINE.md's north star is a <=1e-3 mean mask-IoU delta against the
reference's released pretrained checkpoints (reference README.md:90-96).
Those live on mega.nz, and this environment has zero network egress
(DNS resolution itself fails — recorded below), so the strongest
available evidence is the replica path at FULL geometry: random weights
in the reference's exact state_dict layout (models/torch_ref.py mirrors
src/modules/model.py + torchvision), with randomized BatchNorm running
stats, loaded by BOTH the torch replica and the rsis_tpu importer, and
the two inference forwards (reference protocol: src/test.py:16-50)
compared end to end. Any divergence in conv padding, BN math, bilinear
corner conventions, weight layout, or gate ordering shows up here.

Run: python scripts/make_parity_artifact.py [outfile]
"""
import contextlib
import io
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def egress_probe() -> str:
    try:
        import socket
        socket.setdefaulttimeout(5)
        socket.getaddrinfo("mega.nz", 443)
        return "mega.nz RESOLVED (egress may exist — retry real download)"
    except Exception as e:
        return f"mega.nz DNS lookup failed ({type(e).__name__}: {e})"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PARITY.md"
    import torch

    from rsis_tpu.cli.verify_parity import main as verify_main
    from rsis_tpu.models import torch_ref as tr

    torch.manual_seed(0)
    enc = tr.FeatureExtractor(
        tr.ResNetTaps(tr.Bottleneck, (3, 4, 23, 3)),
        (2048, 1024, 512, 256, 64), hidden_size=128)
    tr.randomize_bn_stats(enc, seed=1)
    dec = tr.RSISDecoder(hidden_size=128, num_classes=21)
    tmp = tempfile.mkdtemp()
    enc_path, dec_path = f"{tmp}/encoder.npz", f"{tmp}/decoder.npz"
    np.savez(enc_path,
             **{k: v.detach().numpy() for k, v in enc.state_dict().items()})
    np.savez(dec_path,
             **{k: v.detach().numpy() for k, v in dec.state_dict().items()})
    n_params = sum(v.numel() for v in enc.state_dict().values()) + \
        sum(v.numel() for v in dec.state_dict().values())

    argv = [enc_path, dec_path, "-base_model", "resnet101",
            "-hidden_size", "128", "-num_classes", "21",
            "-maxseqlen", "10", "-imsize", "256", "-n_images", "2"]
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        rc = verify_main(argv)
    report = buf.getvalue()
    elapsed = time.time() - t0
    print(report)

    git_rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(tmp) and "/root/repo"
                             ).stdout.strip()
    with open(out_path, "w") as f:
        f.write(f"""# PARITY — checkpoint-forward bit-check artifact

**Verdict: {'PASS (within the 1e-3 budget)' if rc == 0 else 'FAIL'}**
(HEAD {git_rev}, {time.strftime('%Y-%m-%d')}; runtime {elapsed:.0f}s, CPU f32)

## Which weights

The reference's released pretrained checkpoints (reference
README.md:90-96) are hosted on mega.nz; this environment has **zero
network egress** — probe at run time: `{egress_probe()}`. The artifact
therefore uses the strongest available substitute: **randomly
initialized weights in the reference's exact `state_dict` layout**
({n_params:,} parameters; torch replica `rsis_tpu/models/torch_ref.py`
mirroring `src/modules/model.py`, `src/modules/clstm.py`,
`src/modules/vision.py` + torchvision ResNet-101), with **randomized
BatchNorm running stats** so inference-mode BN is exercised with
non-trivial statistics. Both sides load the SAME files: torch through
`load_state_dict`, rsis_tpu through the production importer
(`models/torch_import.py` — the same code path a real release
checkpoint would take).

## What was compared

The reference inference protocol (`src/test.py:16-50`): encoder forward,
10 fixed decode steps, per-step align-corners bilinear upsample to input
size, sigmoid masks/stops — at the full cityscapes-eval geometry
(resnet101, hidden 128, 2x 256x512 images, f32, T=10).

## Result

```
{report.rstrip()}
```

The metric is the BASELINE.md budget: mean over all (image, timestep)
pairs of `1 - softIoU(mask_jax, mask_torch)`, budget 1e-3.

## What this does and does not prove

Proves: weight-layout import, conv/BN semantics, skip-fusion order, gate
chunk order, ConvLSTM state handling, align-corners upsample corners,
and head math are equivalent at the exact deployment geometry — the
failure modes SURVEY.md §7 "checkpoint bit-parity" names. A deliberately
injected importer bug turns the check red
(tests/test_verify_parity_cli.py::test_parity_detects_importer_bug).

Does not prove: agreement with the authors' released weight VALUES.
A shared misreading of the reference that affects both the replica and
the importer identically would pass. Re-run against the real weights the
moment any environment can reach them:

    python -m rsis_tpu.cli.verify_parity encoder.pt decoder.pt
""")
    print(f"wrote {out_path} (rc={rc})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
