"""CLI drivers mirroring the reference's two entry points
(train.py:17-46, generate_frames.py:17-41) — same flags, same defaults —
plus TPU-native extras (mesh shape, checkpoint resume, profiling)."""
