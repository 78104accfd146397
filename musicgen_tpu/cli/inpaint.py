"""RePaint inpainting demo: MIDI -> canvas -> masked RePaint -> MIDI.

The end-to-end driver the reference only sketches in
diffusion/diffusion_model_testing.ipynb (it builds the model + canvases but
never runs the inpaint loop to MIDI):

  python -m musicgen_tpu.cli.inpaint --ckpt ckpt_dir --midi in.mid \
      --out inpainted.mid [--mask-start 32 --mask-end 96] [--ema] \
      [--respacing ddim25] [--jumps]

Pipeline: extract_midi -> create_canvas -> normalize -> crop --width ->
gt_keep_mask zeroing the masked time columns -> `p_sample_loop_scan` (ONE
compiled lax.scan over the full RePaint jump schedule, params passed as jit
arguments so weights never inline) -> denormalize -> canvas_to_notes ->
note_to_midi.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser(description="RePaint MIDI inpainting")
    p.add_argument("--ckpt", required=True, help="train_diffusion --ckpt dir")
    p.add_argument("--midi", required=True, help="input MIDI file")
    p.add_argument("--out", required=True, help="output MIDI path")
    p.add_argument("--width", type=int, default=128, help="canvas time width")
    p.add_argument("--offset", type=int, default=0, help="crop start column")
    p.add_argument("--mask-start", type=int, default=None,
                   help="first masked (regenerated) time column; default W/4")
    p.add_argument("--mask-end", type=int, default=None,
                   help="one past the last masked column; default 3W/4")
    p.add_argument("--respacing", default="ddim25",
                   help="timestep respacing ('' = all 1000 steps)")
    p.add_argument("--jumps", action="store_true",
                   help="full RePaint jump schedule (t_T=250 ladder) instead "
                        "of a plain reverse pass")
    p.add_argument("--ema", action="store_true",
                   help="sample with the EMA parameters")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import orbax.checkpoint as ocp

    from ..diffusion import (
        DiffusionDefaults,
        RePaintConf,
        canvas_to_notes,
        create_canvas,
        create_model_and_diffusion,
        denormalize_canvas,
        normalize_canvas,
    )
    from ..midi import extract_midi, note_to_midi

    notes = extract_midi(args.midi)
    if not notes:
        raise SystemExit(f"no notes extracted from {args.midi}")
    canvas = normalize_canvas(create_canvas(notes))
    w = args.width
    if canvas.shape[-1] < w:
        canvas = np.pad(canvas, ((0, 0), (0, 0), (0, w - canvas.shape[-1])),
                        constant_values=-1.0)
    gt = canvas[None, :, :, args.offset : args.offset + w].astype(np.float32)

    m0 = args.mask_start if args.mask_start is not None else w // 4
    m1 = args.mask_end if args.mask_end is not None else 3 * w // 4
    keep = np.ones_like(gt)
    keep[:, :, :, m0:m1] = 0.0  # regenerate these time columns

    defaults = DiffusionDefaults(timestep_respacing=args.respacing)
    model, diffusion = create_model_and_diffusion(defaults)
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
    params = raw["ema"] if args.ema else raw["params"]

    times = None
    if args.jumps:
        conf = RePaintConf(schedule_jump_params=dict(
            t_T=diffusion.num_timesteps, n_sample=1,
            jump_length=10, jump_n_sample=10,
        ))
        times = conf.jump_times()

    shape = gt.shape

    @jax.jit
    def run(params, gt, keep, rng):
        model_fn = lambda x, t: model.apply(params, x, t)
        return diffusion.p_sample_loop_scan(
            model_fn, shape, rng, gt=gt, gt_keep_mask=keep, times=times
        )

    out = run(params, jnp.asarray(gt), jnp.asarray(keep),
              jax.random.PRNGKey(args.seed))
    out = np.asarray(out)[0]
    out_notes = canvas_to_notes(denormalize_canvas(out))
    note_to_midi(out_notes, args.out)
    print(f"inpainted columns [{m0}, {m1}) -> {args.out} "
          f"({len(out_notes)} notes)")


if __name__ == "__main__":
    main()
