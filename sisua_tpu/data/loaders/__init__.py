"""Dataset loaders (download → preprocess → cache → SingleCellOMIC).

Mirrors the reference loader inventory (``SURVEY.md`` §2.3,
``/root/reference/sisua/data/data_loader/*``). Every loader follows the same
pattern: fetch raw files (public URL or GEO accession, MD5-validated) into
DOWNLOAD_DIR, preprocess into DATA_DIR/<name>_preprocessed, and wrap the
cached matrices as a SingleCellOMIC with 1–3 omics. In offline environments
the download step raises an actionable error naming the file to pre-place;
the synthetic family (sisua_tpu.data.synthetic) covers tests/benchmarks.
"""

from .tenx import read_dataset10x
from .pbmc8k import read_PBMC8k
from .pbmcecc import read_PBMCeec
from .citeseq import read_CITEseq_CBMC, read_CITEseq_PBMC
from .facs import read_FACS, read_full_FACS
from .scvi_datasets import read_Cortex, read_Hemato, read_PBMC, read_Retina
from .leukemia import read_leukemia_BMMC, read_leukemia_MixedPhenotypes
from .misc import (read_centenarian, read_human_embryos,
                   read_melanoma_cisTopicData, read_mouse_ATLAS,
                   read_scale_dataset)
from .cross import read_PBMC_crossdataset, read_PBMC_crossdataset_remove_protein

__all__ = [
    "read_dataset10x", "read_PBMC8k", "read_PBMCeec", "read_CITEseq_CBMC",
    "read_CITEseq_PBMC", "read_FACS", "read_full_FACS", "read_Cortex",
    "read_Hemato", "read_PBMC", "read_Retina", "read_leukemia_BMMC",
    "read_leukemia_MixedPhenotypes", "read_centenarian", "read_human_embryos",
    "read_melanoma_cisTopicData", "read_mouse_ATLAS", "read_scale_dataset",
    "read_PBMC_crossdataset", "read_PBMC_crossdataset_remove_protein",
]
