"""CLI: python -m satnerf_tpu.serve <run_dp> [--host H] [--port P]
[--chunk N] [--epoch E] [--platform cpu|tpu|...] [--fast-sine 1]

--platform pins the JAX backend before initialisation (needed where a
site-installed PJRT plugin overrides the JAX_PLATFORMS env var).
--fast-sine 1 renders with the degree-5 sine kernel (PSNR-neutral, ~6%
faster; the documented trade for pure view serving)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    run_dp, kwargs = argv[0], {}
    it = iter(argv[1:])
    for flag in it:
        key = flag.lstrip("-").replace("-", "_")
        val = next(it)
        if key == "fast_sine":
            kwargs[key] = val not in ("0", "false", "no")
        else:
            kwargs[key] = val if key in ("host", "platform") else int(val)
    platform = kwargs.pop("platform", None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from satnerf_tpu.serve.http_server import serve

    serve(run_dp, **kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
