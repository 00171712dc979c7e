"""ber_sweep: BER waterfall curves over SNR per modulation scheme.

The analysis tool the reference lacked: sweeps the simulated channel's SNR,
runs batched loopbacks entirely on the accelerator, and reports BER per
(modulation, SNR) as JSON plus a terminal waterfall plot.
"""

from __future__ import annotations

import argparse
import json
import math

import numpy as np

import ofdm_tpu as ot
from ofdm_tpu.obs.logging import set_up_logging


def measure_ber(mod: ot.Modulation, snr: float, *, batch: int, payload: int,
                guard_bands: bool, cfo: bool, seed: int) -> float:
    import jax
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (batch, payload), dtype=np.uint8)
    tx = ot.encode(data, guard_bands=guard_bands, modulation=mod)
    rx = ot.channel(tx, snr=snr, timing_error=cfo, key=jax.random.key(seed))
    nb = ot.n_data_blocks(payload, mod, guard_bands)
    out = ot.decode_frame(rx, n_blocks=nb, guard_bands=guard_bands,
                          modulation=mod)
    got = np.asarray(out)[:, 16:16 + payload]
    errs = np.unpackbits(np.bitwise_xor(got, data)).sum()
    return float(errs) / (data.size * 8)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snrs", type=float, nargs="*",
                   default=[0, 5, 10, 15, 20, 25, 30])
    p.add_argument("--modulations", nargs="*",
                   default=["bpsk", "qpsk", "qam16", "qam64"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--payload", type=int, default=256)
    p.add_argument("--guard-bands", action="store_true", default=True)
    p.add_argument("--cfo", action="store_true")
    p.add_argument("--json", action="store_true", help="JSON only, no plot")
    args = p.parse_args(argv)

    log = set_up_logging("ber_sweep")
    results = {}
    for name in args.modulations:
        mod = ot.Modulation(name)
        curve = []
        for snr in args.snrs:
            ber = measure_ber(mod, snr, batch=args.batch, payload=args.payload,
                              guard_bands=args.guard_bands, cfo=args.cfo,
                              seed=int(snr * 10) + 7)
            curve.append(ber)
            log.info("%s @ %.0f dB: BER %.2e", mod.name, snr, ber)
        results[name] = curve

    print(json.dumps({"snrs": args.snrs, "ber": results}))
    if not args.json:
        # terminal waterfall: log10(BER) per curve
        floor = 1.0 / (args.batch * args.payload * 8)
        print("\nlog10(BER) (floor = %.1f):" % math.log10(floor))
        for name, curve in results.items():
            row = " ".join(
                f"{math.log10(max(b, floor)):6.2f}" for b in curve)
            print(f"  {name:6s} {row}")
        print("  snr    " + " ".join(f"{s:6.0f}" for s in args.snrs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
