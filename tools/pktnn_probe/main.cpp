// PocketNN-library MNIST DFA learning-curve probe on t10k data (2000 train / 500 test)
#include "pktnn.h"
#include <iostream>
#include <fstream>
#include <vector>
using namespace pktnn;

int main() {
  int nTrain = 2000, nTest = 500;
  // load idx files manually (pktloader paths are hard-coded)
  auto readImages = [](const char* p, int n, int skip) {
    std::ifstream f(p, std::ios::binary); f.seekg(16 + skip * 784);
    pktmat m(n, 784);
    std::vector<unsigned char> buf(784);
    for (int i = 0; i < n; i++) { f.read((char*)buf.data(), 784);
      for (int j = 0; j < 784; j++) m.setElem(i, j, buf[j]); }
    return m; };
  auto readLabels = [](const char* p, int n, int skip) {
    std::ifstream f(p, std::ios::binary); f.seekg(8 + skip);
    pktmat m(n, 1); unsigned char c;
    for (int i = 0; i < n; i++) { f.read((char*)&c, 1); m.setElem(i, 0, c); }
    return m; };
  const char* IMG = "/tmp/pktbench/t10k-images-idx3-ubyte";
  const char* LBL = "/root/reference/data/mnist/MNIST/raw/t10k-labels-idx1-ubyte";
  pktmat xtr = readImages(IMG, nTrain, 0), xte = readImages(IMG, nTest, nTrain);
  pktmat ytr = readLabels(LBL, nTrain, 0), yte = readLabels(LBL, nTest, nTrain);

  pktactv::Actv a = pktactv::Actv::pocket_tanh;
  pktfc fc1(784, 100), fc2(100, 50), fcLast(50, 10);
  fc1.useDfa(true).setActv(a).setNextLayer(fc2);
  fc2.useDfa(true).setActv(a).setNextLayer(fcLast);
  fcLast.useDfa(true).setActv(a);

  pktmat trainTargets(nTrain, 10);
  for (int r = 0; r < nTrain; r++) trainTargets.setElem(r, ytr.getElem(r, 0), UNSIGNED_4BIT_MAX);

  int mb = 20, lrInv = 1000;
  pktmat lossDeltaMat, mbImages, mbTargets, lossMat;
  std::vector<int> idx(nTrain); for (int i = 0; i < nTrain; i++) idx[i] = i;
  for (int e = 0; e < 10; e++) {
    for (int i = 0; i < nTrain; i++) std::swap(idx[i], idx[rand() % nTrain]);
    int sumLoss = 0;
    for (int b = 0; b + mb <= nTrain; b += mb) {
      int* sel = idx.data();
      mbImages.indexedSlicedSamplesOf(xtr, sel, b, b + mb);
      mbTargets.indexedSlicedSamplesOf(trainTargets, sel, b, b + mb);
      // note indexedSlicedSamplesOf signature may differ; fallback manual slice below
      fc1.forward(mbImages);
      sumLoss += pktloss::batchL2Loss(lossMat, mbTargets, fcLast.mOutput);
      pktloss::batchL2LossDelta(lossDeltaMat, mbTargets, fcLast.mOutput);
      fcLast.backward(lossDeltaMat, lrInv);
    }
    // test acc
    fc1.forward(xte);
    int nc = 0;
    for (int r = 0; r < nTest; r++) if (fcLast.mOutput.getMaxIndexInRow(r) == yte.getElem(r, 0)) nc++;
    std::cout << "epoch " << e << " loss " << sumLoss << " testacc " << (nc * 1.0 / nTest) << std::endl;
  }
  return 0;
}
