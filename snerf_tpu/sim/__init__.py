"""L5 simulation pipeline (S-NeRF++ data generation), in-process.

Replaces the reference's 7-stage `os.system` shell chain
(s-nerfpp/config_run.py:43-96, filesystem-as-IPC) with an in-process
pipeline around the batch render API (SURVEY.md §3.4):

  background render (render.py --render_mode random)
  -> placement (sim.placement: BEV drivable map + position sampling)
  -> foreground render (sim.rasterizer over mesh assets)
  -> composition (sim.compose: occlusion order, depth/semantic fuse, bbox)
  -> inpainting hook (pluggable)
  -> shadows (sim.shadows)
  -> annotation assembly (sim.annotate)
"""
