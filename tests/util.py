"""Shared test helpers — re-exported from the package so bench.py and the
driver entry use the identical synthetic fixtures."""

from acmmp_tpu.utils.synth import look_at_camera, textured_plane_scene

__all__ = ["look_at_camera", "textured_plane_scene"]
