"""CLI: python -m satnerf_tpu.serve <run_dp> [--host H] [--port P]
[--chunk N] [--epoch E] [--platform cpu|tpu|...] [--fast-sine 1]

--platform pins the JAX backend before initialisation (needed where a
site-installed PJRT plugin overrides the JAX_PLATFORMS env var).
--fast-sine 1 renders with the degree-5 sine kernel (~7% faster). The
sine-swap study (docs/performance.md "quality gate") measured eval-time
engine swap as metric-free on trained checkpoints — RGB and depth both —
so the flag is safe for all served outputs; the ~0.9 m poly5 altitude
bias arises only when TRAINING with poly5."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    run_dp, kwargs = argv[0], {}
    rest = argv[1:]
    i = 0
    while i < len(rest):
        flag = rest[i]
        if not flag.startswith("-"):
            print(f"unexpected argument {flag!r}\n\n{__doc__}")
            return 1
        key = flag.lstrip("-").replace("-", "_")
        has_val = i + 1 < len(rest) and not rest[i + 1].startswith("-")
        if key == "fast_sine":
            # value optional: bare --fast-sine means on
            val = rest[i + 1] if has_val else "1"
            kwargs[key] = val.lower() not in ("0", "false", "no", "off")
            i += 2 if has_val else 1
            continue
        if not has_val:
            print(f"missing value for --{key}\n\n{__doc__}")
            return 1
        val = rest[i + 1]
        kwargs[key] = val if key in ("host", "platform") else int(val)
        i += 2
    platform = kwargs.pop("platform", None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from satnerf_tpu.serve.http_server import serve

    serve(run_dp, **kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
