from .resample import bilinear_sample, bilinear_sample_3d_faces
from .rasterizer_ref import render_dense, Camera, RenderOutput
from .rasterizer import render_tiled
