// golden_proto_ref — serializes a .fatcube with the REAL protobuf runtime
// against the reference's schema (ffat_map.proto compiled with protoc),
// following the reference's field population order
// (FFAT_Map_Serialize_Double::Save, ffat_map_serialize.h:90-164). Used to
// prove the framework's hand-rolled wire codec reads/writes byte-compatible
// files.
//
// Build:
//   protoc --cpp_out=$PB -I/root/reference /root/reference/ffat_map.proto
//   g++ -O2 -std=c++17 -I$PB -o golden_proto_ref \
//       tools/golden_proto_ref.cc $PB/ffat_map.pb.cc -lprotobuf
//
// Usage: golden_proto_ref <map.bin> <out.fatcube>
// map.bin: the blob layout documented in tools/golden_ffat_ref.cc.

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

#include "ffat_map.pb.h"

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s map.bin out.fatcube\n", argv[0]);
    return 1;
  }
  std::ifstream mf(argv[1], std::ios::binary);
  mf.seekg(0, std::ios::end);
  const size_t n = static_cast<size_t>(mf.tellg()) / sizeof(double);
  mf.seekg(0);
  std::vector<double> blob(n);
  mf.read(reinterpret_cast<char*>(blob.data()), n * sizeof(double));
  size_t i = 0;
  auto next = [&]() { return blob.at(i++); };

  ffat_map::ffat_map_double file;
  ffat_map::ffat_map_t_3* map3 = file.mutable_map();
  ffat_map::ffat_map_t_1* map1 = map3->mutable_shells();

  const double k = next();
  double center[3];
  for (double& c : center) c = next();
  map1->set_cellsize(next());
  double bbox_low[3], bbox_top[3];
  for (double& c : bbox_low) c = next();
  for (double& c : bbox_top) c = next();
  // lowcorners: mat of 6 vec3 (field order mirrors the reference Save)
  ffat_map::mat* lc = map1->mutable_lowcorners();
  for (int f = 0; f < 6; ++f) {
    ffat_map::vec* v = lc->add_item();
    for (int d = 0; d < 3; ++d) v->add_item(next());
  }
  ffat_map::mat_i* ne = map1->mutable_n_elements();
  for (int f = 0; f < 6; ++f) {
    ffat_map::vec_i* v = ne->add_item();
    v->add_item(static_cast<int>(next()));
    v->add_item(static_cast<int>(next()));
  }
  ffat_map::vec_i* st = map1->mutable_strides();
  for (int f = 0; f < 6; ++f) st->add_item(static_cast<int>(next()));
  for (double c : center) map1->mutable_center()->add_item(c);
  for (double c : bbox_low) map1->mutable_bboxlow()->add_item(c);
  for (double c : bbox_top) map1->mutable_bboxtop()->add_item(c);

  map3->set_k(k);
  for (double c : center) map3->mutable_center()->add_item(c);
  map3->set_is_compressed(false);
  const int n_psi = static_cast<int>(next());
  ffat_map::vec* col = map3->mutable_psi()->add_item();
  for (int p = 0; p < n_psi; ++p) col->add_item(next());
  map3->set_modeid(0);

  std::ofstream out(argv[2], std::ios::binary);
  file.SerializeToOstream(&out);
  return 0;
}
