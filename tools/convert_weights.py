#!/usr/bin/env python
"""Convert public HF checkpoints to avede_tpu ``.npz`` weights.

The reference downloads pretrained torch models at runtime
(``/root/reference/src/models/openclip_model.py:29-150``,
``blip_model.py:126-330``); here conversion is an explicit offline step
so serving never depends on torch, and the ``.npz`` output loads
straight into the Flax models.

Usage:
    python tools/convert_weights.py --model clip \
        --src /path/to/openai-clip-vit-base-patch32 --out clip.npz

``--src`` accepts a HF snapshot directory (``from_pretrained``) or a
raw torch state-dict file (``.pt``/``.bin``/``.safetensors``). The tool
prints the settings knob to point at the output.

| --model      | HF class                        | settings knob              |
|--------------|---------------------------------|----------------------------|
| clip         | CLIPModel                       | CLIP_WEIGHTS               |
| blip         | BlipForConditionalGeneration    | BLIP_WEIGHTS               |
| blip2        | Blip2ForImageTextRetrieval      | BLIP_WEIGHTS (blip2 engine)|
| owlvit       | OwlViTForObjectDetection        | OWLVIT_WEIGHTS             |
| efficientnet | EfficientNetModel               | FEATURE_EXTRACTOR_WEIGHTS  |
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Any, Dict, Mapping

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

KNOBS = {
    "clip": "CLIP_WEIGHTS",
    "blip": "BLIP_WEIGHTS",
    "blip2": "BLIP_WEIGHTS",
    "owlvit": "OWLVIT_WEIGHTS",
    "efficientnet": "FEATURE_EXTRACTOR_WEIGHTS",
}

HF_CLASSES = {
    "clip": "CLIPModel",
    "blip": "BlipForConditionalGeneration",
    "blip2": "Blip2ForImageTextRetrieval",
    "owlvit": "OwlViTForObjectDetection",
    "efficientnet": "EfficientNetModel",
}


def load_state_dict(src: str, model: str) -> Mapping[str, Any]:
    if os.path.isdir(src):
        import transformers

        cls = getattr(transformers, HF_CLASSES[model])
        return cls.from_pretrained(src).state_dict()
    if src.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(src)
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    return sd.get("state_dict", sd) if isinstance(sd, dict) else sd


def _depth(sd: Mapping[str, Any], pattern: str) -> int:
    idx = [int(m.group(1)) for k in sd if (m := re.match(pattern, k))]
    if not idx:
        raise ValueError(f"no layers matching {pattern!r} in checkpoint")
    return 1 + max(idx)


def convert(model: str, sd: Mapping[str, Any]) -> Dict[str, Any]:
    if model == "clip":
        from avede_tpu.models.convert import convert_clip_state_dict

        return convert_clip_state_dict(
            sd, _depth(sd, r"vision_model\.encoder\.layers\.(\d+)\."),
            _depth(sd, r"text_model\.encoder\.layers\.(\d+)\."))
    if model == "blip":
        from avede_tpu.models.convert import convert_blip_state_dict

        return convert_blip_state_dict(
            sd, _depth(sd, r"vision_model\.encoder\.layers\.(\d+)\."),
            _depth(sd, r"text_decoder\.bert\.encoder\.layer\.(\d+)\."))
    if model == "blip2":
        from avede_tpu.models.qformer import (QFormerConfig,
                                              convert_blip2_state_dict)

        cfg = QFormerConfig(
            vision_depth=_depth(
                sd, r"vision_model\.encoder\.layers\.(\d+)\."),
            depth=_depth(sd, r"qformer\.encoder\.layer\.(\d+)\."))
        return convert_blip2_state_dict(sd, cfg)
    if model == "owlvit":
        from avede_tpu.models.owlvit import convert_owlvit_state_dict

        pre = "owlvit."
        return convert_owlvit_state_dict(
            sd,
            _depth(sd, rf"{pre}vision_model\.encoder\.layers\.(\d+)\."),
            _depth(sd, rf"{pre}text_model\.encoder\.layers\.(\d+)\."))
    if model == "efficientnet":
        from avede_tpu.models.effnet import convert_effnet_state_dict

        return convert_effnet_state_dict(sd)
    raise ValueError(f"unknown model kind: {model}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", required=True, choices=sorted(KNOBS))
    ap.add_argument("--src", required=True,
                    help="HF snapshot dir or torch state-dict file")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    from avede_tpu.models.convert import save_params

    sd = load_state_dict(args.src, args.model)
    params = convert(args.model, sd)
    save_params(params, args.out)
    n = sum(1 for _ in _leaves(params))
    print(f"wrote {args.out} ({n} arrays)")
    print(f"point settings.{KNOBS[args.model]} (env var "
          f"{KNOBS[args.model]}) at it")
    return 0


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    raise SystemExit(main())
