"""jax.profiler trace capture for the training loop (--profile DIR).

The reference has no in-process profiling at all (SURVEY.md §5 — its only
story is out-of-process nvidia-smi sampling); this is the TPU-native
equivalent: a bounded window of training iterations captured as an XLA
trace viewable in TensorBoard / Perfetto (xprof).

The window skips the first iterations (compilation would dominate the
trace) and stops after `n_iters` so the trace stays small. On backends
where trace capture is broken (the dev tunnel yields empty traces,
PERF.md) start/stop failures degrade to a warning instead of killing
training.
"""

from __future__ import annotations


class ProfileWindow:
    """start_trace/stop_trace around iterations [start, start + n_iters)."""

    def __init__(self, trace_dir: str | None, start: int = 2, n_iters: int = 8):
        self.trace_dir = trace_dir
        self.start = start
        self.end = start + n_iters
        self.active = False
        self.done = trace_dir is None

    def tick(self, iters: int) -> None:
        """Call once per loop iteration (or per fused scan call) with the
        current global iteration number."""
        if self.done:
            return
        import jax

        if not self.active and iters >= self.start:
            try:
                jax.profiler.start_trace(self.trace_dir)
                self.active = True
            except Exception as e:  # pragma: no cover - backend-dependent
                print(f"경고: 프로파일 트레이스 시작 실패: {e}")
                self.done = True
                return
        if self.active and iters >= self.end:
            self.stop()

    def stop(self) -> None:
        """Idempotent; also called at loop exit so a short run still
        produces a trace."""
        if not self.active:
            self.done = True
            return
        import jax

        try:
            jax.profiler.stop_trace()
            print(f"프로파일 트레이스 저장: {self.trace_dir} "
                  f"(tensorboard --logdir 로 열기)")
        except Exception as e:  # pragma: no cover - backend-dependent
            print(f"경고: 프로파일 트레이스 종료 실패: {e}")
        self.active = False
        self.done = True
