#!/usr/bin/env python
"""Convert torch `lpips` AlexNet weights to the .npz this framework reads.

Run on any machine with `lpips` + `torch` installed (needs to download the
torchvision AlexNet weights once):

    python scripts/convert_lpips.py lpips_alex.npz

then copy the file next to robust_e_nerf_tpu/loss_metric/ (as
`lpips_alex.npz`) or point $LPIPS_WEIGHTS_NPZ at it.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output", help="output .npz path")
    parser.add_argument("--net", default="alex", choices=["alex"])
    args = parser.parse_args()

    import lpips
    import torch

    model = lpips.LPIPS(net=args.net)
    model.eval()

    out = {}
    convs = [
        m for m in model.net.slice1 if isinstance(m, torch.nn.Conv2d)
    ]
    for slice_name in ("slice2", "slice3", "slice4", "slice5"):
        convs += [
            m for m in getattr(model.net, slice_name)
            if isinstance(m, torch.nn.Conv2d)
        ]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w
    np.savez(args.output, **out)
    print(f"wrote {args.output} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
