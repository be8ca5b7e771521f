// Minimal stand-in for the cxxopts header (the reference repo's cxxopts
// submodule is empty in this checkout). Implements ONLY the subset the
// reference binaries use — long/short options, typed values with
// default_value, count() of explicitly-specified options, as<T>() with
// default fallback — so the unmodified reference sources compile for
// golden-output testing. Original API shape (c) Jarryd Beck's cxxopts;
// this is an independent minimal reimplementation.
#pragma once
// transitive includes the real cxxopts provides and the
// reference sources rely on
#include <math.h>
#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace cxxopts {

class OptionException : public std::runtime_error {
 public:
  explicit OptionException(const std::string& m) : std::runtime_error(m) {}
};

struct ValueSpec {
  std::string default_val;
  bool has_default = false;
  bool is_bool = false;
  std::shared_ptr<ValueSpec> default_value(const std::string& v) {
    auto c = std::make_shared<ValueSpec>(*this);
    c->default_val = v;
    c->has_default = true;
    return c;
  }
};

template <typename T>
std::shared_ptr<ValueSpec> value() {
  auto v = std::make_shared<ValueSpec>();
  v->is_bool = false;
  return v;
}
template <>
inline std::shared_ptr<ValueSpec> value<bool>() {
  auto v = std::make_shared<ValueSpec>();
  v->is_bool = true;
  v->has_default = true;
  v->default_val = "false";
  return v;
}

namespace detail {
template <typename T>
T convert(const std::string& s) {
  std::istringstream is(s);
  T out;
  is >> out;
  if (is.fail()) throw OptionException("bad value: " + s);
  return out;
}
template <>
inline std::string convert<std::string>(const std::string& s) { return s; }
template <>
inline bool convert<bool>(const std::string& s) {
  return s == "true" || s == "1";
}
}  // namespace detail

class OptionValue {
 public:
  size_t cnt = 0;
  std::string raw;
  const ValueSpec* spec = nullptr;
  template <typename T>
  T as() const {
    if (cnt) return detail::convert<T>(raw);
    if (spec && spec->has_default) return detail::convert<T>(spec->default_val);
    throw OptionException("option not given and has no default");
  }
};

class ParseResult {
 public:
  std::map<std::string, OptionValue> values;
  size_t count(const std::string& name) const {
    auto it = values.find(name);
    return it == values.end() ? 0 : it->second.cnt;
  }
  const OptionValue& operator[](const std::string& name) const {
    auto it = values.find(name);
    if (it == values.end()) throw OptionException("unknown option " + name);
    return it->second;
  }
};

class Options {
 public:
  Options(std::string name, std::string desc = "")
      : m_name(std::move(name)), m_desc(std::move(desc)) {}

  class OptionAdder {
   public:
    explicit OptionAdder(Options& o) : m_opts(o) {}
    OptionAdder& operator()(const std::string& spec, const std::string&,
                            std::shared_ptr<ValueSpec> val = value<bool>(),
                            const std::string& = "") {
      std::string s, l;
      auto comma = spec.find(',');
      if (comma == std::string::npos) {
        l = spec;
      } else {
        s = spec.substr(0, comma);
        l = spec.substr(comma + 1);
      }
      m_opts.m_specs[l] = val;
      if (!s.empty()) m_opts.m_short[s] = l;
      return *this;
    }
   private:
    Options& m_opts;
  };

  OptionAdder add_options() { return OptionAdder(*this); }

  ParseResult parse(int argc, char* argv[]) {
    ParseResult r;
    for (auto& kv : m_specs) {
      r.values[kv.first].spec = kv.second.get();
    }
    for (int i = 1; i < argc; ++i) {
      std::string a = argv[i];
      std::string name, val;
      bool has_val = false;
      if (a.rfind("--", 0) == 0) {
        name = a.substr(2);
      } else if (a.rfind("-", 0) == 0 && a.size() > 1) {
        auto it = m_short.find(a.substr(1));
        if (it == m_short.end()) throw OptionException("unknown option " + a);
        name = it->second;
      } else {
        throw OptionException("unexpected positional argument " + a);
      }
      auto eq = name.find('=');
      if (eq != std::string::npos) {
        val = name.substr(eq + 1);
        name = name.substr(0, eq);
        has_val = true;
      }
      auto spec = m_specs.find(name);
      if (spec == m_specs.end()) throw OptionException("unknown option " + a);
      auto& slot = r.values[name];
      if (!has_val) {
        if (spec->second->is_bool) {
          val = "true";
        } else {
          if (i + 1 >= argc)
            throw OptionException("missing value for " + name);
          val = argv[++i];
        }
      }
      slot.raw = val;
      slot.cnt += 1;
    }
    return r;
  }

  std::string help() const { return m_name + ": " + m_desc + "\n"; }

 private:
  friend class OptionAdder;
  std::string m_name, m_desc;
  std::map<std::string, std::shared_ptr<ValueSpec>> m_specs;
  std::map<std::string, std::string> m_short;
};

}  // namespace cxxopts
