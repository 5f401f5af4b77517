// Standalone timing harness for the reference's PASTA->BFV decomposition
// (vendored SEAL 4.0 + src/pasta), no gRPC. Measures seconds per 128-word
// block transcipher at the production parameters (N=16384, t=65537).
#include <chrono>
#include <iostream>
#include <memory>
#include <vector>
#include "SEAL_Cipher.h"
#include "pasta_3_seal.h"
#include "pasta_3_plain.h"

using namespace std::chrono;

int main(int argc, char** argv) {
  int reps = argc > 1 ? atoi(argv[1]) : 3;
  uint64_t plain_mod = 65537, mod_degree = 16384, seclevel = 128;
  auto context = pasta::SEALZpCipher::create_context(mod_degree, plain_mod, seclevel);
  seal::KeyGenerator keygen(*context);
  seal::SecretKey sk = keygen.secret_key();
  seal::PublicKey pk; keygen.create_public_key(pk);
  seal::RelinKeys rk; keygen.create_relin_keys(rk);

  std::vector<uint64_t> key(256, 1);
  for (int i = 0; i < 256; i++) key[i] = (i * 7919 + 13) % plain_mod;
  pasta::PASTA pasta_plain(key, plain_mod);

  pasta::PASTA_SEAL hhe(context, pk, sk, rk, seal::GaloisKeys());
  std::vector<int> gk_indices = {0, -1, 128};
  seal::GaloisKeys gk;
  {
    std::vector<uint32_t> elts;
    auto slots = 16384;
    for (int i : gk_indices) {
      if (i == 0) elts.push_back(2 * mod_degree - 1);
      else {
        uint32_t e = 1; uint64_t g = 3, m = 2 * mod_degree;
        uint64_t steps = (i < 0) ? (mod_degree/2 + i) : i;
        uint64_t acc = 1;
        for (uint64_t s = 0; s < steps; s++) acc = acc * g % m;
        elts.push_back((uint32_t)acc);
      }
    }
    keygen.create_galois_keys(elts, gk);
  }
  pasta::PASTA_SEAL hhe2(context, pk, sk, rk, gk);

  std::vector<uint64_t> plain(128);
  for (int i = 0; i < 128; i++) plain[i] = i % plain_mod;
  std::vector<uint64_t> ct = pasta_plain.encrypt(plain);
  auto enc_key = hhe2.encrypt_key_2(key);

  // warmup + check
  auto res = hhe2.decomposition(ct, enc_key);
  auto dec = hhe2.decrypt_result(res);
  bool ok = true;
  for (int i = 0; i < 128; i++) if (dec[i] != plain[i]) ok = false;
  std::cout << "parity: " << (ok ? "OK" : "FAIL") << std::endl;

  auto t0 = high_resolution_clock::now();
  for (int r = 0; r < reps; r++) { auto res2 = hhe2.decomposition(ct, enc_key); }
  auto t1 = high_resolution_clock::now();
  double s = duration_cast<milliseconds>(t1 - t0).count() / 1000.0 / reps;
  std::cout << "seconds_per_block: " << s << std::endl;
  return 0;
}
