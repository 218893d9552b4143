from . import sdf, inertia, surface, qp, toc, frank_wolfe, filtering
