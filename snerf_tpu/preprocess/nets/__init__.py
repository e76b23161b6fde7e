"""Learned preprocessing nets (flax/JAX), replacing the reference's
external model zoo (SURVEY.md §2.2 P5-P7) with in-repo TPU/CPU-runnable
equivalents behind the same plug-in contracts (preprocess/pipeline.py):

  erfnet   — ERFNet (Romera et al.), exact architecture parity with
             Sparse-Depth-Completion/Models/ERFNet.py:1-151 (also the
             original cityscapes segmentation net)
  sdc      — SDC uncertainty_net (global ERFNet + hourglass local net +
             confidence fusion), parity Models/model.py:13-174
  raftlite — correlation-volume + iterative-update optical flow
             (SepFlow/RAFT class), parity core/sepflow.py:1-259
"""
