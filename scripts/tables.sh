#!/usr/bin/env bash
# Emit the mean±std and seed-paired (Wilcoxon) markdown tables + regenerate
# boxplots for every downstream protocol (paste into BASELINE.md).
# Supersedes round3_tables.sh (adds --paired and the CheXpert protocol).
set -uo pipefail
cd "$(dirname "$0")/.."
for spec in \
  "expr_output/styled-mnist/classification styledmnist expr_output/styled-mnist/analysis" \
  "expr_output/celeba/classification celeba expr_output/celeba/analysis" \
  "expr_output/pacs/classification pacs expr_output/pacs/analysis" \
  "expr_output/camelyon17/classification camelyon17 expr_output/camelyon17/analysis" \
  "expr_output/chexpert/classification chexpert expr_output/chexpert/analysis"; do
  set -- $spec
  echo; echo "### $2"
  python -m clearvae_tpu.experiments.analyze --result_dir "$1" \
      --prefix "$2" --markdown --paired --out "$3"
done
