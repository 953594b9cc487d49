from .transcripts import generate_transcripts, write_transcripts
from .dims import dim_roles_pdf, dim_tools_pdf, TOOLS

__all__ = [
    "generate_transcripts",
    "write_transcripts",
    "dim_roles_pdf",
    "dim_tools_pdf",
    "TOOLS",
]
