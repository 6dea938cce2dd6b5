"""Probe 10 (negative result): native Pallas X sweep vs the swapaxes
sandwich around the Y kernel.

Hypothesis: with the 6-connectivity neighbor relax dropped (subsumed by
the bidirectional sweeps), the four 512^3 int32 HBM transposes of the
X-via-Y path are ~40% of per-round traffic; an axis-2 kernel holding a
(TZ=8, TY=128, X) block in VMEM, transposing to (8, X, 128) scratch,
scanning the middle axis, and transposing back would cut ~4.5 GB/round.

Result (2026-08-19, v5e chip via axon relay):
- interpret mode: bit-exact vs ops.watershed._sweep_axis (axis 2).
- hardware: the kernel FAULTED the TPU worker at run time on the very
  first 64^3 call — ``UNAVAILABLE: TPU worker process crashed or
  restarted.  This can be caused by a kernel fault`` — i.e. not a Mosaic
  compile rejection but a runtime fault, almost certainly the in-kernel
  3-D ``jnp.swapaxes(x, 1, 2)`` on (8, 128, X) i32 VMEM values (both the
  load-transpose into scratch and the store-transpose out).
- CLAUDE.md rule 11 pattern again: interpret-mode tests cannot catch
  this class; every new kernel shape needs one real-TPU run before it
  ships anywhere the bench or smoke can reach.

Outcome: the kernel was removed; ops.watershed._sweep_x_pallas keeps the
reliable transposed-Y formulation and documents this probe.  The measured
per-round cost at 512^3 with relax dropped + transposed X is 43.5 ms
(.project8_tpu.json), down from 75.8 ms, so the watershed stage no longer
dominates the v5e-8 projection and the residual transpose overhead
(~0.03 s projected) does not justify further kernel risk on this stack.
"""
