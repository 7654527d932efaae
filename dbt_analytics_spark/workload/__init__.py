from .models import build_project  # noqa: F401
