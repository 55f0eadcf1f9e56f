from .vectors import sqdist, dot, l2norm, cosine_sim, centroids_literal  # noqa: F401
