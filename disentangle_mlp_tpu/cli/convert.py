"""``dmt-convert`` — migrate a reference PyTorch ``.tar`` checkpoint into
this framework's checkpoint format.

The reference saves {epoch, <model state dicts>, <optimizer state dicts>}
per epoch (reference: new_betavaegan.py:221-228, new_vae.py:88-91,
new_gan.py:169-174). This tool converts the model weights (layout mapping
documented in utils/torch_compat.py) and writes a checkpoint that
``--load_path`` restores like any native one, with the original epoch —
so a torch run migrates mid-training:

    dmt-convert --model betavaegan --torch_checkpoint model_7.tar \\
        --output /runs/mig/models/model_7
    dmt-train --model betavaegan --name mig --load_path \\
        /runs/mig/models/model_7 ...

Optimizer moments are not migrated (fresh Adam state; torch_compat.py
docstring explains why) — the first migrated epochs re-warm the moments.
"""

from __future__ import annotations

import jax

from ..config import Config, build_arg_parser
from ..utils.checkpoint import save_checkpoint
from ..utils.torch_compat import convert_reference_checkpoint


def main(argv=None) -> None:
    parser = build_arg_parser("convert a reference torch checkpoint")
    parser.add_argument("--model", type=str, default="betavaegan",
                        choices=["vae", "gan", "betavaegan", "vaegan"])
    parser.add_argument("--torch_checkpoint", type=str, required=True)
    parser.add_argument("--output", type=str, default="",
                        help="output checkpoint path (default: the input "
                             "path with .tar replaced by .converted)")
    ns = parser.parse_args(argv)
    model = vars(ns).pop("model")
    src = vars(ns).pop("torch_checkpoint")
    dst = vars(ns).pop("output") or (
        src[:-4] if src.endswith(".tar") else src) + ".converted"
    cfg = Config(**vars(ns)).finalize(make_dirs=False)

    converted = convert_reference_checkpoint(src, model, cfg)
    epoch = converted.pop("epoch")

    # Build the experiment once to obtain the full ModelState templates
    # (fresh optimizer state), then drop the converted weights in.
    if model == "vae":
        from ..train.vae import create_vae_experiment
        exp = create_vae_experiment(cfg, jax.random.key(cfg.seed))
        states = {"model": _merge(exp.state, converted["model"])}
    elif model == "gan":
        from ..train.gan import create_gan_experiment
        exp = create_gan_experiment(cfg, jax.random.key(cfg.seed))
        states = {"g": _merge(exp.g_state, converted["g"]),
                  "d": _merge(exp.d_state, converted["d"])}
    else:
        from ..train.vaegan import create_vaegan_experiment
        exp = create_vaegan_experiment(cfg, jax.random.key(cfg.seed))
        states = {"eg": _merge(exp.eg_state, converted["eg"]),
                  "d": _merge(exp.d_state, converted["d"])}

    out = save_checkpoint(dst, epoch, states)
    print(f"converted epoch-{epoch} checkpoint written to {out}")


def _merge(template_state, tree):
    return template_state.replace(params=tree["params"],
                                  batch_stats=tree["batch_stats"])


if __name__ == "__main__":
    main()
