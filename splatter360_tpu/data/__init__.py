from .synthetic import random_gaussians, random_scene
