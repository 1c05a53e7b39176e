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
#   Rscript tools/convert_rds.R counts.rds out_dir [labels.rds] [orient]
#     orient: auto (default) | cells-rows | features-rows
#       auto assumes the larger axis is cells (true for the named use
#       cases: MPAL ~35k cells x ~20k genes, cisTopic cells >> topics);
#       pass features-rows / cells-rows explicitly when your matrix has
#       fewer cells than features.
# then finalize on the python side (writes npz + MD5 manifest):
#   python -m sisua_tpu.data.loaders.finalize_cache out_dir
suppressMessages(library(Matrix))

args <- commandArgs(trailingOnly = TRUE)
if (length(args) < 2) stop(
  "usage: convert_rds.R counts.rds out_dir [labels.rds] [orient]")
orient <- if (length(args) >= 4) args[4] else "auto"
obj <- readRDS(args[1])
dir.create(args[2], showWarnings = FALSE, recursive = TRUE)

orient_cells_rows <- function(m, what) {
  # sisua expects cells x features
  flip <- switch(orient,
    "auto" = nrow(m) < ncol(m),   # larger axis = cells
    "cells-rows" = FALSE,          # already cells x features
    "features-rows" = TRUE,        # stored features x cells
    stop("orient must be auto | cells-rows | features-rows"))
  if (flip) m <- t(m)
  cat(sprintf("%s: %d cells x %d features (%s)\n",
              what, nrow(m), ncol(m),
              if (flip) "transposed" else "as stored"))
  m
}

ids_or_stop <- function(ids, n, what) {
  # .rds matrices without dimnames would silently write 0-line id files —
  # the cache folder then looks complete and only breaks downstream
  if (is.null(ids)) stop(sprintf(
    "%s has no %s names stored — supply dimnames on the .rds (e.g. gene
     ids / cell barcodes) before converting", args[1], what))
  if (length(ids) != n) stop(sprintf(
    "%s: %d names for %d entries", what, length(ids), n))
  ids
}

m <- orient_cells_rows(as(obj, "CsparseMatrix"), "counts")
writeMM(m, file.path(args[2], "X.mtx"))
writeLines(ids_or_stop(colnames(m), ncol(m), "feature"),
           file.path(args[2], "X_col.txt"))
writeLines(ids_or_stop(rownames(m), nrow(m), "cell"),
           file.path(args[2], "X_row.txt"))

if (length(args) >= 3 && nzchar(args[3])) {
  y <- readRDS(args[3])
  if (is.factor(y) || is.character(y)) {
    if (length(y) != nrow(m)) stop(sprintf(
      "labels have %d entries but counts have %d cells — check orient /
       that the labels match this matrix", length(y), nrow(m)))
    lv <- sort(unique(as.character(y)))
    oh <- Matrix(0, nrow = length(y), ncol = length(lv), sparse = TRUE)
    oh[cbind(seq_along(y), match(as.character(y), lv))] <- 1
    writeMM(as(oh, "CsparseMatrix"), file.path(args[2], "y.mtx"))
    writeLines(lv, file.path(args[2], "y_col.txt"))
  } else {
    # label MATRICES need the same orientation handling as the counts
    # (ADT panels are stored proteins x cells just as often)
    y <- orient_cells_rows(as(y, "CsparseMatrix"), "labels")
    if (nrow(y) != nrow(m)) stop(sprintf(
      "labels have %d cells but counts have %d — check orient", nrow(y),
      nrow(m)))
    writeMM(y, file.path(args[2], "y.mtx"))
    writeLines(colnames(y), file.path(args[2], "y_col.txt"))
  }
}
cat("wrote", args[2], "- finalize with: python -m",
    "sisua_tpu.data.loaders.finalize_cache", args[2], "\n")
