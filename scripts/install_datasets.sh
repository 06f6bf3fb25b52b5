#!/usr/bin/env bash
# Dataset downloader/installer — framework equivalent of the reference's
# install_datasets.sh (reference install_datasets.sh:1-98): fetches
# CIFAR-10, ImageNette, miniImageNet and ImageNet-1K into a target
# directory in the layouts data/pipeline.py's loaders expect.
#
# Same flag interface as the reference, plus -e for CIFAR-10 (which the
# reference ships as in-repo blobs instead of downloading).
set -euo pipefail

help_function() {
  echo ""
  echo "Usage: $0 -a Y/N -b Y/N -c Y/N [-e Y/N] -d PATH"
  echo -e "\t-a Download and install ImageNette?     type:(Y/N)"
  echo -e "\t-b Download and install mini-ImageNet?  type:(Y/N)"
  echo -e "\t-c Download and install ImageNet?       type:(Y/N)"
  echo -e "\t-e Download and install CIFAR-10?       type:(Y/N, default N)"
  echo -e "\t-d Directory path for datasets          type:PATH"
  exit 1
}

A="" ; B="" ; C="" ; E="N" ; D=""
while getopts "a:b:c:e:d:" opt; do
  case "$opt" in
    a ) A="$OPTARG" ;;
    b ) B="$OPTARG" ;;
    c ) C="$OPTARG" ;;
    e ) E="$OPTARG" ;;
    d ) D="$OPTARG" ;;
    ? ) help_function ;;
  esac
done

if [ -z "$A" ] || [ -z "$B" ] || [ -z "$C" ] || [ -z "$D" ]; then
  echo "Some or all of the parameters are empty"
  help_function
fi

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
DATASET_DIR="$D"
mkdir -p "$DATASET_DIR"
cd "$DATASET_DIR"

fetch() {  # fetch URL [output]
  if command -v wget >/dev/null; then
    wget -c "$1" ${2:+-O "$2"}
  elif command -v curl >/dev/null; then
    curl -L -C - "$1" ${2:+-o "$2"}
  else
    echo "ERROR: neither wget nor curl available" >&2
    exit 2
  fi
}

# CIFAR-10 python batches (data/pipeline.py load_cifar10 reads
# cifar-10-batches-py/, the same layout the reference vendors in
# dct-cryptonets/cifardataset/)
if [ "$E" == Y ]; then
  echo "Downloading and installing CIFAR-10..."
  fetch https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz
  tar -zxvf cifar-10-python.tar.gz
fi

# ImageNette (reference install_datasets.sh:37-46)
if [ "$A" == Y ]; then
  echo "Downloading and installing ImageNette..."
  mkdir -p ImageNette && cd ImageNette
  fetch https://s3.amazonaws.com/fast-ai-imageclas/imagenette2.tgz
  tar -zxvf imagenette2.tgz
  cd "$DATASET_DIR"
fi

# miniImageNet: split CSVs + ILSVRC2015 images, then build the JSON
# manifests the dataset loader consumes (reference install_datasets.sh:48-63;
# manifest builder parity: tools/make_miniimagenet_json.py)
if [ "$B" == Y ]; then
  echo "Downloading and installing miniImageNet..."
  mkdir -p miniImagenet && cd miniImagenet
  BASE=https://raw.githubusercontent.com/twitter/meta-learning-lstm/master/data/miniImagenet
  fetch "$BASE/test.csv" test.csv
  fetch "$BASE/train.csv" train.csv
  fetch "$BASE/val.csv" val.csv
  fetch http://image-net.org/image/ILSVRC2015/ILSVRC2015_CLS-LOC.tar.gz
  tar -zxvf ILSVRC2015_CLS-LOC.tar.gz
  cd "$DATASET_DIR"
  python "$REPO_DIR/tools/make_miniimagenet_json.py" --dataset_dir "$DATASET_DIR/miniImagenet"
fi

# ImageNet-1K (ILSVRC2012) in the train/<wnid>/*.JPEG val/<wnid>/*.JPEG
# layout (reference install_datasets.sh:65-98)
if [ "$C" == Y ]; then
  echo "Downloading and installing ImageNet-1K (ILSVRC2012)..."
  # ILSVRC2012_img_val.tar   ~6.3 GB  MD5 29b22e2961454d5413ddabcf34fc5622
  # ILSVRC2012_img_train.tar ~138 GB  MD5 1d675b47d978889d74fa0da5fadfb00e
  fetch https://image-net.org/data/ILSVRC/2012/ILSVRC2012_img_val.tar
  fetch https://image-net.org/data/ILSVRC/2012/ILSVRC2012_img_train.tar

  mkdir -p ImageNet && cd ImageNet
  mkdir -p train && mv ../ILSVRC2012_img_train.tar train/ && cd train
  tar -xvf ILSVRC2012_img_train.tar && rm -f ILSVRC2012_img_train.tar
  find . -name "*.tar" | while read -r NAME; do
    mkdir -p "${NAME%.tar}"
    tar -xvf "$NAME" -C "${NAME%.tar}"
    rm -f "$NAME"
  done
  cd ..

  mkdir -p val && mv ../ILSVRC2012_img_val.tar val/ && cd val
  tar -xvf ILSVRC2012_img_val.tar
  # regroup val images into per-class dirs (same script the reference uses)
  fetch https://raw.githubusercontent.com/soumith/imagenetloader.torch/master/valprep.sh valprep.sh
  bash valprep.sh
fi

echo "Done."
