#!/bin/bash
# Fetch Pascal VOC 2007+2012 and unpack into the layout the pascal_voc
# source expects (reference: pascal-voc/download-data.sh).
set -e

mkdir -p trainval test
wget -c http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar
wget -c http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar
wget -c http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar

tar -C trainval -xf VOCtrainval_06-Nov-2007.tar
tar -C trainval -xf VOCtrainval_11-May-2012.tar
tar -C test -xf VOCtest_06-Nov-2007.tar
