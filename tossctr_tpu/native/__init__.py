from .build import get_fastgather, have_fastgather

__all__ = ["get_fastgather", "have_fastgather"]
