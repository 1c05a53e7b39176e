#!/usr/bin/env Rscript
# Convert an R .rds count matrix (dgCMatrix or dense) — e.g. the cisTopic
# melanoma counts (GSE114557) or the MPAL supplements (Granja 2019) — into
# the save_to_dataset folder format consumed by sisua_tpu loaders:
#   out_dir/X.mtx        (MatrixMarket; convert to .sparse.npz with python)
#   out_dir/X_col.txt    (one feature id per line)
#   out_dir/X_row.txt    (one cell id per line)
#   [out_dir/y.mtx, out_dir/y_col.txt]  when a label .rds is given
#
# Usage:
#   Rscript tools/convert_rds.R counts.rds out_dir [labels.rds]
# then finalize on the python side (writes npz + MD5 manifest):
#   python -m sisua_tpu.data.loaders.finalize_cache out_dir
suppressMessages(library(Matrix))

args <- commandArgs(trailingOnly = TRUE)
if (length(args) < 2) stop("usage: convert_rds.R counts.rds out_dir [labels.rds]")
obj <- readRDS(args[1])
dir.create(args[2], showWarnings = FALSE, recursive = TRUE)

m <- as(obj, "CsparseMatrix")
# sisua expects cells x features; .rds matrices are typically features x cells
if (nrow(m) > ncol(m)) m <- t(m)
writeMM(m, file.path(args[2], "X.mtx"))
writeLines(colnames(m), file.path(args[2], "X_col.txt"))
writeLines(rownames(m), file.path(args[2], "X_row.txt"))

if (length(args) >= 3) {
  y <- readRDS(args[3])
  if (is.factor(y) || is.character(y)) {
    lv <- sort(unique(as.character(y)))
    oh <- Matrix(0, nrow = length(y), ncol = length(lv), sparse = TRUE)
    oh[cbind(seq_along(y), match(as.character(y), lv))] <- 1
    writeMM(as(oh, "CsparseMatrix"), file.path(args[2], "y.mtx"))
    writeLines(lv, file.path(args[2], "y_col.txt"))
  } else {
    y <- as(y, "CsparseMatrix")
    writeMM(y, file.path(args[2], "y.mtx"))
    writeLines(colnames(y), file.path(args[2], "y_col.txt"))
  }
}
cat("wrote", args[2], "- finalize with: python -m",
    "sisua_tpu.data.loaders.finalize_cache", args[2], "\n")
